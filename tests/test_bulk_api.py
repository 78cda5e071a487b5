"""Bulk ingestion APIs must be exactly equivalent to per-item calls."""

import numpy as np

import nllstpu as nt
from nllstpu.core.optimize import compile_problem


def residual(meas, a, b):
    return a * b[0] - meas


def test_bulk_equivalent_to_single():
    rng = np.random.default_rng(0)
    scalars = rng.standard_normal(5)
    vecs = rng.standard_normal((4, 2))
    ia = rng.integers(0, 5, size=12).astype(np.int32)
    ib = rng.integers(0, 4, size=12).astype(np.int32)
    meas = rng.standard_normal(12)

    p1 = nt.Problem()
    hs = [p1.add_variable(nt.Scalar(), v) for v in scalars]
    hv = [p1.add_variable(nt.Euclidean(2), v) for v in vecs]
    for k in range(12):
        p1.add_cost(residual, (hs[ia[k]], hv[ib[k]]), params=meas[k])

    p2 = nt.Problem()
    p2.add_variables(nt.Scalar(), scalars)
    p2.add_variables(nt.Euclidean(2), vecs)
    p2.add_cost_batch(
        residual, slots=[(nt.Scalar(), ia), (nt.Euclidean(2), ib)], params=meas
    )

    assert p1.num_costs() == p2.num_costs() == 12
    np.testing.assert_allclose(nt.cost(p1), nt.cost(p2), rtol=1e-15)
    c1 = compile_problem(p1)
    c2 = compile_problem(p2)
    v1, v2 = p1.stacked_variables(), p2.stacked_variables()
    cost1, (a1, b1) = c1.assemble(v1)
    cost2, (a2, b2) = c2.assemble(v2)
    np.testing.assert_allclose(a1, a2, rtol=1e-14)
    np.testing.assert_allclose(b1, b2, rtol=1e-14)
    counts1 = p1.var_cost_counts()
    counts2 = p2.var_cost_counts()
    for k in counts1:
        np.testing.assert_array_equal(counts1[k], counts2[k])


def test_mixed_single_and_bulk():
    p = nt.Problem()
    x = p.add_variable(nt.Scalar(), 1.0)
    v = p.add_variable(nt.Euclidean(2), np.array([2.0, 3.0]))
    p.add_cost(residual, (x, v), params=0.5)
    p.add_cost_batch(
        residual,
        slots=[(nt.Scalar(), np.array([0, 0])), (nt.Euclidean(2), np.array([0, 0]))],
        params=np.array([1.0, 2.0]),
    )
    assert p.num_costs() == 3
    # 3 residuals: 1·2−0.5, 1·2−1, 1·2−2 → ½(1.5² + 1² + 0²) = 1.625
    np.testing.assert_allclose(nt.cost(p), 0.5 * (1.5**2 + 1.0**2 + 0.0**2))
