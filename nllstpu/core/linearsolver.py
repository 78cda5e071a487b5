"""Linear solvers for the normal equations.

Reference parity: src/linearsolver.jl — dense/static systems use Cholesky
with a fallback factorization when the matrix is not positive definite
(``try_cholesky!``, lines 7-26); the sparse LDLᵀ path is replaced TPU-natively
by the Schur-complement solver in :mod:`nllstpu.ops.schur` (sparse direct
factorization does not map to the MXU; see SURVEY.md §2 "native" table).

All solvers are jit/vmap-compatible: the not-positive-definite check is a
runtime ``lax.cond`` on NaNs in the Cholesky factor rather than an exception.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_solve(a, b):
    """Solve a x = b via Cholesky, falling back to an LU solve when ``a`` is
    not positive definite (the reference falls back to QR; for square
    nonsingular systems LU yields the same solution and maps better to XLA).
    """

    chol = jnp.linalg.cholesky(a)
    ok = jnp.all(jnp.isfinite(chol))

    def _chol(_):
        y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
        return jax.scipy.linalg.solve_triangular(chol, y, lower=True, trans=1)

    def _lu(_):
        return jnp.linalg.solve(a, b)

    return jax.lax.cond(ok, _chol, _lu, None)


def solve_symmetric(a, b):
    """Entry point used by the iterators: x = a \\ b."""
    return cholesky_solve(a, b)


def batched_cholesky_solve(a, b):
    """vmapped Cholesky-with-fallback over leading batch dims; used by the
    per-variable alternation solver (``optimize_singles``) and the Schur
    landmark elimination."""
    return jax.vmap(cholesky_solve)(a, b)


def invert_psd(a):
    """Inverse of a symmetric positive-definite matrix (reference ``invsym``,
    src/linearsolver.jl:35-36, used for covariance extraction)."""
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    return cholesky_solve(a, eye)
