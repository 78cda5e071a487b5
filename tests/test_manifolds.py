"""Manifold unit tests: retract(x, 0) identity (required for the fixed-var
dustbin mechanism), range constraints, and SO(3)/SE(3) group properties."""

import jax
import jax.numpy as jnp
import numpy as np

import nllstpu as nt


def _check_zero_identity(man, x, atol=0.0):
    out = man.retract(jnp.asarray(x), jnp.zeros(man.dof))
    np.testing.assert_allclose(out, x, atol=atol, rtol=0)


def test_euclidean():
    man = nt.Euclidean(3)
    _check_zero_identity(man, np.array([1.0, -2.0, 3.0]))
    out = man.retract(jnp.array([1.0, 2.0, 3.0]), jnp.array([0.1, 0.2, 0.3]))
    np.testing.assert_allclose(out, [1.1, 2.2, 3.3])


def test_scalar():
    man = nt.Scalar()
    _check_zero_identity(man, np.array(2.0))
    assert man.retract(jnp.asarray(1.0), jnp.array([0.5])) == 1.5


def test_zero_to_inf():
    man = nt.ZeroToInf()
    _check_zero_identity(man, np.array(3.0))
    x = jnp.asarray(2.0)
    # Multiplicative-exp update (src/variable.jl:22).
    np.testing.assert_allclose(man.retract(x, jnp.array([0.7])), 2.0 * np.exp(0.7))
    # Always positive, even from 0.
    assert man.retract(jnp.asarray(0.0), jnp.array([-5.0])) > 0


def test_zero_to_one():
    man = nt.ZeroToOne()
    _check_zero_identity(man, np.array(0.4))
    for v in [0.01, 0.4, 0.99]:
        for d in [-3.0, 0.0, 3.0, 50.0]:
            out = float(man.retract(jnp.asarray(v), jnp.array([d])))
            assert 0.0 < out <= 1.0
    # Matches the reference formula v·eᵈ/(1 + v·eᵈ − v).
    v, d = 0.3, 0.8
    expected = v * np.exp(d) / (1 + v * np.exp(d) - v)
    np.testing.assert_allclose(man.retract(jnp.asarray(v), jnp.array([d])), expected)


def test_so3():
    man = nt.SO3()
    r0 = jnp.eye(3)
    _check_zero_identity(man, np.eye(3))
    w = jnp.array([0.3, -0.2, 0.5])
    r = man.retract(r0, w)
    # Orthogonality and det 1.
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)
    # Rotation angle equals |w|.
    angle = np.arccos((np.trace(r) - 1) / 2)
    np.testing.assert_allclose(angle, np.linalg.norm(w), rtol=1e-10)
    # jacfwd at zero tangent is finite and matches finite differences.
    f = lambda t: man.retract(r, t)
    jac = jax.jacfwd(f)(jnp.zeros(3))
    eps = 1e-7
    for i in range(3):
        fd = (f(jnp.zeros(3).at[i].set(eps)) - f(jnp.zeros(3).at[i].set(-eps))) / (
            2 * eps
        )
        np.testing.assert_allclose(jac[..., i], fd, atol=1e-6)


def test_se3():
    man = nt.SE3()
    x0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    _check_zero_identity(man, np.asarray(x0))
    delta = jnp.array([0.1, 0.2, -0.1, 1.0, 2.0, 3.0])
    out = man.retract(x0, delta)
    np.testing.assert_allclose(out[:, :3] @ out[:, :3].T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(out[:, 3], [1.0, 2.0, 3.0])


def test_contaminated_gaussian_manifold_sorting():
    man = nt.ContaminatedGaussianManifold()
    p = jnp.array([2.0, 1.0, 0.5])
    _check_zero_identity(man, np.asarray(p))
    # A tangent step that would reverse the order gets re-sorted
    # (src/robustadaptive.jl:14).
    out = man.retract(p, jnp.array([-2.0, 0.5, 0.0]))
    assert out[0] >= out[1]


def test_batch_retract():
    from nllstpu.core.manifolds import batch_retract

    man = nt.Euclidean(2)
    xs = jnp.arange(6.0).reshape(3, 2)
    deltas = jnp.ones((3, 2))
    np.testing.assert_allclose(batch_retract(man, xs, deltas), np.asarray(xs) + 1)
