"""Per-variable alternation tests, mirroring the reference's
``optimizesingles!`` usage: polish all landmarks of a BA problem with the
cameras fixed (test/optimizeba.jl:61-62), each landmark solved independently
(vmapped univariate LM)."""

import numpy as np

import nllstpu as nt
from nllstpu.core.singles import optimize_singles
from nllstpu.models.ba import make_affine_ba, perturb_ba


def test_landmark_polish():
    p, cams, lmks = make_affine_ba(3, 5, 1.0)
    perturb_ba(p, lmks, 0.003, seed=3)
    assert nt.cost(p) > 1e-6
    optimize_singles(p, nt.Options(), targets=nt.Euclidean(3))
    assert nt.cost(p) < 1e-15
    # Cameras untouched.
    p2, cams2, _ = make_affine_ba(3, 5, 1.0)
    for h, h2 in zip(cams, cams2):
        np.testing.assert_array_equal(p.get_value(h), p2.get_value(h2))


def test_landmark_polish_sparse_newton():
    p, cams, lmks = make_affine_ba(6, 20, 0.4)
    perturb_ba(p, lmks, 0.01, seed=5)
    optimize_singles(p, nt.Options(iterator=nt.NEWTON), targets=nt.Euclidean(3))
    assert nt.cost(p) < 1e-15


def test_subset_of_handles():
    p, cams, lmks = make_affine_ba(3, 5, 1.0)
    perturb_ba(p, lmks, 0.01, seed=6)
    before = [np.asarray(p.get_value(h)) for h in lmks]
    optimize_singles(p, nt.Options(), targets=lmks[:2])
    # Only the first two landmarks moved.
    for i, h in enumerate(lmks):
        moved = not np.array_equal(p.get_value(h), before[i])
        assert moved == (i < 2)


def test_scalar_family_singles():
    """Univariate alternation on a scalar family (storage shape ())."""
    p = nt.Problem()
    xs = [p.add_variable(nt.Scalar(), 0.0) for _ in range(5)]
    targets_vals = np.array([1.0, -2.0, 3.0, 0.5, -0.25])
    for h, t in zip(xs, targets_vals):
        p.add_cost(lambda tv, x: x - tv, (h,), params=t)
    optimize_singles(p, nt.Options(iterator=nt.NEWTON), targets=nt.Scalar())
    got = np.array([float(p.get_value(h)) for h in xs])
    np.testing.assert_allclose(got, targets_vals, rtol=1e-10)
