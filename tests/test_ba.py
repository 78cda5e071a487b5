"""Bundle-adjustment end-to-end tests, mirroring
/root/reference/test/optimizeba.jl: measurements generated from ground truth
so full optimization must reach cost < 1e-15 on both the dense (3 cam, 5 lmk,
100% visibility) and sparse (10 cam, 50 lmk, 30%) configurations; plus
landmark-only optimization with cameras fixed."""

import numpy as np
import pytest

import nllstpu as nt
from nllstpu.models.ba import make_affine_ba, make_pinhole_ba, perturb_ba


def test_ba_dense_full_optimize():
    p, cams, lmks = make_affine_ba(3, 5, 1.0)
    perturb_ba(p, lmks, 0.001, seed=3)
    perturb_ba(p, cams, 0.001, seed=4)
    result = nt.optimize(p)
    np.testing.assert_allclose(nt.cost(p), result.best_cost, atol=1e-300)
    assert result.best_cost < 1e-15


def test_ba_landmarks_only():
    # Reference polishes landmarks with optimizesingles! (optimizeba.jl:61-62)
    # — here the equivalent family-restricted optimize with cameras fixed.
    p, cams, lmks = make_affine_ba(3, 5, 1.0)
    perturb_ba(p, lmks, 0.003, seed=3)
    result = nt.optimize(p, unfixed=nt.Euclidean(3))
    assert result.best_cost < 1e-15
    # Cameras must be untouched (fixed through the dustbin mechanism).
    p2, cams2, _ = make_affine_ba(3, 5, 1.0)
    for h, h2 in zip(cams, cams2):
        np.testing.assert_array_equal(p.get_value(h), p2.get_value(h2))


def test_ba_sparse_full_optimize():
    p, cams, lmks = make_affine_ba(10, 50, 0.3)
    perturb_ba(p, lmks, 0.001, seed=3)
    perturb_ba(p, cams, 0.001, seed=4)
    result = nt.optimize(p)
    np.testing.assert_allclose(nt.cost(p), result.best_cost, atol=1e-300)
    assert result.best_cost < 1e-15


@pytest.mark.parametrize("iterator", [nt.LEVENBERG_MARQUARDT, nt.DOGLEG])
def test_pinhole_ba(iterator):
    """SE(3)+pinhole family converges to zero reprojection error from a
    perturbed start (ground-truth measurements)."""
    p, cams, lmks = make_pinhole_ba(4, 12, 1.0)
    perturb_ba(p, lmks, 0.01, seed=5)
    result = nt.optimize(p, nt.Options(iterator=iterator))
    assert result.best_cost < 1e-18


def test_pinhole_hand_jacobian_matches_autodiff():
    """The analytic pinhole SE(3) Jacobian must match jacfwd through the
    retraction exactly (system-level: assembled H and g agree)."""
    import jax
    from nllstpu.core.optimize import compile_problem

    p1, _, l1 = make_pinhole_ba(4, 12, 1.0, hand_jacobian=False)
    p2, _, l2 = make_pinhole_ba(4, 12, 1.0, hand_jacobian=True)
    perturb_ba(p1, l1, 0.05, seed=9)
    perturb_ba(p2, l2, 0.05, seed=9)
    c1 = compile_problem(p1)
    c2 = compile_problem(p2)
    cost1, (a1, b1) = jax.jit(c1.assemble)(p1.stacked_variables())
    cost2, (a2, b2) = jax.jit(c2.assemble)(p2.stacked_variables())
    np.testing.assert_allclose(cost1, cost2, rtol=1e-12)
    np.testing.assert_allclose(b1, b2, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(a1, a2, rtol=1e-8, atol=1e-12)


def test_pinhole_hand_jacobian_optimizes():
    p, cams, lmks = make_pinhole_ba(4, 12, 1.0, hand_jacobian=True)
    perturb_ba(p, lmks, 0.01, seed=5)
    result = nt.optimize(p, nt.Options(solver="schur", schur_family=nt.Euclidean(3)))
    assert result.best_cost < 1e-18


def test_pinhole_batched_matches_vmapped():
    """The whole-batch scalar-expanded pinhole residual+jacobian must match
    the vmapped autodiff path at the system level."""
    import jax
    from nllstpu.core.optimize import compile_problem

    p1, _, l1 = make_pinhole_ba(4, 12, 0.8, hand_jacobian=False)
    p2, _, l2 = make_pinhole_ba(4, 12, 0.8, batched=True)
    perturb_ba(p1, l1, 0.05, seed=9)
    perturb_ba(p2, l2, 0.05, seed=9)
    c1 = compile_problem(p1)
    c2 = compile_problem(p2)
    cost1, (a1, b1) = jax.jit(c1.assemble)(p1.stacked_variables())
    cost2, (a2, b2) = jax.jit(c2.assemble)(p2.stacked_variables())
    np.testing.assert_allclose(cost1, cost2, rtol=1e-12)
    np.testing.assert_allclose(b1, b2, rtol=1e-8, atol=1e-13)
    np.testing.assert_allclose(a1, a2, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(
        float(jax.jit(c1.cost)(p1.stacked_variables())),
        float(jax.jit(c2.cost)(p2.stacked_variables())),
        rtol=1e-12,
    )
    result = nt.optimize(
        p2, nt.Options(solver="schur", schur_family=nt.Euclidean(3))
    )
    assert result.best_cost < 1e-15


def test_pinhole_cm_matches_vmapped():
    """Components-major pinhole residual/jacobian must match the vmapped
    autodiff path at the system level."""
    import jax
    from nllstpu.core.optimize import compile_problem

    p1, _, l1 = make_pinhole_ba(4, 12, 0.8, hand_jacobian=False)
    p2, _, l2 = make_pinhole_ba(4, 12, 0.8, batched="cm")
    perturb_ba(p1, l1, 0.05, seed=9)
    perturb_ba(p2, l2, 0.05, seed=9)
    c1, c2 = compile_problem(p1), compile_problem(p2)
    cost1, (a1, b1) = jax.jit(c1.assemble)(p1.stacked_variables())
    cost2, (a2, b2) = jax.jit(c2.assemble)(p2.stacked_variables())
    np.testing.assert_allclose(cost1, cost2, rtol=1e-12)
    np.testing.assert_allclose(b1, b2, rtol=1e-8, atol=1e-13)
    np.testing.assert_allclose(a1, a2, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(
        float(jax.jit(c1.cost)(p1.stacked_variables())),
        float(jax.jit(c2.cost)(p2.stacked_variables())),
        rtol=1e-12,
    )
    result = nt.optimize(
        p2, nt.Options(solver="schur", schur_family=nt.Euclidean(3))
    )
    assert result.best_cost < 1e-15
