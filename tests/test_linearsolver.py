"""Linear-solver unit tests, mirroring /root/reference/test/linearsolve.jl:
SPD systems via Cholesky, and non-positive-definite systems through the
runtime fallback path."""

import jax
import jax.numpy as jnp
import numpy as np

from nllstpu.core import linearsolver


def test_spd():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((8, 8))
    a = m @ m.T + 8 * np.eye(8)
    x_true = rng.standard_normal(8)
    b = a @ x_true
    x = linearsolver.solve_symmetric(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(x, x_true, rtol=1e-10)


def test_negative_definite_fallback():
    rng = np.random.default_rng(1)
    m = rng.standard_normal((6, 6))
    a = -(m @ m.T + 6 * np.eye(6))  # negative definite → Cholesky fails
    x_true = rng.standard_normal(6)
    b = a @ x_true
    x = linearsolver.solve_symmetric(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(x, x_true, rtol=1e-8)


def test_solver_under_jit_and_vmap():
    rng = np.random.default_rng(2)
    ms = rng.standard_normal((5, 4, 4))
    a = np.einsum("bij,bkj->bik", ms, ms) + 4 * np.eye(4)
    x_true = rng.standard_normal((5, 4))
    b = np.einsum("bij,bj->bi", a, x_true)
    x = jax.jit(linearsolver.batched_cholesky_solve)(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(x, x_true, rtol=1e-9)


def test_invert_psd():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((5, 5))
    a = m @ m.T + 5 * np.eye(5)
    inv = linearsolver.invert_psd(jnp.asarray(a))
    np.testing.assert_allclose(inv @ a, np.eye(5), atol=1e-10)
