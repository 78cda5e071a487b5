"""Plain (non-squared) cost blocks mixed with residuals, mirroring
/root/reference/test/nonsquaredcost.jl: minimizing ½‖Xw − y‖² + yᵀw has the
closed form w* = (XᵀX)⁻¹(Xᵀ − I)y.  Two variable families of different sizes
exercise distinct-shape batching (the reference's static vs dynamic paths)."""

import numpy as np

import nllstpu as nt


def linear_residual(params, w):
    y, x = params
    return x @ w - y


def linear_cost(y, w):
    return y @ w


def test_mixed_residual_and_plain_cost():
    rng = np.random.default_rng(7)
    ndims = 3
    x = rng.standard_normal((ndims, ndims))
    y = rng.standard_normal(ndims)
    solution = np.linalg.solve(x.T @ x, (x.T - np.eye(ndims)) @ y)

    p = nt.Problem()
    w1 = p.add_variable(nt.Euclidean(ndims), np.zeros(ndims))
    p.add_cost(linear_residual, (w1,), params=(y, x))
    p.add_cost(linear_cost, (w1,), params=y, kind="cost")
    # A second family of a different (runtime-chosen) size — the analogue of
    # the reference's dynamic path (nonsquaredcost.jl:59-61).
    ndims2 = 5
    x2 = rng.standard_normal((ndims2, ndims2))
    y2 = rng.standard_normal(ndims2)
    solution2 = np.linalg.solve(x2.T @ x2, (x2.T - np.eye(ndims2)) @ y2)
    w2 = p.add_variable(nt.Euclidean(ndims2), np.zeros(ndims2))
    p.add_cost(linear_residual, (w2,), params=(y2, x2))
    p.add_cost(linear_cost, (w2,), params=y2, kind="cost")

    nt.optimize(p, nt.Options(iterator=nt.NEWTON))
    np.testing.assert_allclose(p.get_value(w1), solution, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(p.get_value(w2), solution2, rtol=1e-8, atol=1e-10)


def test_dynamic_length_vectors():
    """Mirror of /root/reference/test/dynamicvars.jl: a dot-product residual
    plus a norm residual over a length-n vector; at the optimum the variable
    is collinear with X (Xᵀy ≈ ‖y‖)."""
    rng = np.random.default_rng(1)
    n = int(np.ceil((1.0 + rng.random()) * 50))
    x = rng.standard_normal(n)
    x /= np.linalg.norm(x)

    p = nt.Problem()
    w = p.add_variable(nt.Euclidean(n), np.zeros(n))
    p.add_cost(lambda params, v: params[0] @ v - params[1], (w,), params=(x, 1.0))
    p.add_cost(lambda params, v: v, (w,), params=None)
    nt.optimize(p, nt.Options(iterator=nt.NEWTON))
    y = np.asarray(p.get_value(w))
    np.testing.assert_allclose(x @ y, np.linalg.norm(y), rtol=1e-10)
