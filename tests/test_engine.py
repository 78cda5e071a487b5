"""Derivative-engine verification: the assembled gradient must equal the
autodiff gradient of the total cost w.r.t. the global tangent vector — the
framework-level analogue of the reference's derivative-vs-oracle checks
(test/robust.jl pattern applied to the whole assembly path: gather → jacfwd →
robustify → scatter)."""

import jax
import jax.numpy as jnp
import numpy as np

import nllstpu as nt
from nllstpu.core import engine
from nllstpu.core.optimize import compile_problem
from nllstpu.models.ba import make_affine_ba, perturb_ba
from nllstpu.models.rosenbrock import make_rosenbrock


def _check_gradient(problem, unfixed=None):
    compiled = compile_problem(problem, unfixed)
    variables = problem.stacked_variables()
    cost, (a, b) = jax.jit(compiled.assemble)(variables)

    def total_from_tangent(t):
        newvars = compiled.apply(variables, t)
        return compiled.cost(newvars)

    t0 = jnp.zeros(compiled.layout.dof_total)
    np.testing.assert_allclose(cost, total_from_tangent(t0), rtol=1e-12)
    grad = jax.grad(total_from_tangent)(t0)
    np.testing.assert_allclose(b, grad, rtol=1e-9, atol=1e-12)
    # The Hessian must be symmetric.
    np.testing.assert_allclose(a, a.T, rtol=1e-12, atol=1e-12)
    return a, b


def test_rosenbrock_gradient():
    p, _, _ = make_rosenbrock(x0=-0.5, y0=2.5)
    _check_gradient(p)


def test_ba_gradient():
    p, cams, lmks = make_affine_ba(3, 5, 1.0)
    perturb_ba(p, lmks, 0.1, seed=3)
    perturb_ba(p, cams, 0.1, seed=4)
    _check_gradient(p)


def test_ba_gradient_with_fixed():
    p, cams, lmks = make_affine_ba(4, 6, 0.8)
    perturb_ba(p, lmks, 0.1, seed=3)
    _check_gradient(p, unfixed=nt.Euclidean(3))


def test_gauss_newton_hessian_matches_jj():
    """For an unrobustified linear residual the assembled H must be exactly
    the autodiff Hessian of the cost."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 4))
    y = rng.standard_normal(4)
    p = nt.Problem()
    w = p.add_variable(nt.Euclidean(4), np.zeros(4))
    p.add_cost(lambda params, v: params[1] @ v - params[0], (w,), params=(y, x))
    compiled = compile_problem(p)
    variables = p.stacked_variables()
    _, (a, b) = compiled.assemble(variables)
    np.testing.assert_allclose(a, x.T @ x, rtol=1e-12)
    np.testing.assert_allclose(b, x.T @ (x @ np.zeros(4) - y), rtol=1e-12)


def test_custom_jacobian():
    """User-supplied hand Jacobian (reference computeresjac override,
    src/docstrings.jl:220) must reproduce the autodiff path exactly."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 3))
    y = rng.standard_normal(4)

    def res(params, w):
        yy, xx = params
        return xx @ w - yy

    def res_jac(params, w):
        yy, xx = params
        return xx @ w - yy, xx

    p_auto = nt.Problem()
    w1 = p_auto.add_variable(nt.Euclidean(3), np.ones(3))
    p_auto.add_cost(res, (w1,), params=(y, x))

    p_hand = nt.Problem()
    w2 = p_hand.add_variable(nt.Euclidean(3), np.ones(3))
    p_hand.add_cost(res, (w2,), params=(y, x), jacobian=res_jac)

    from nllstpu.core.optimize import compile_problem as cp

    ca, ch = cp(p_auto), cp(p_hand)
    va, vh = p_auto.stacked_variables(), p_hand.stacked_variables()
    _, (aa, ba) = ca.assemble(va)
    _, (ah, bh) = ch.assemble(vh)
    np.testing.assert_allclose(aa, ah, rtol=1e-13)
    np.testing.assert_allclose(ba, bh, rtol=1e-13)
    r = nt.optimize(p_hand, nt.Options(iterator=nt.NEWTON))
    np.testing.assert_allclose(
        p_hand.get_value(w2), np.linalg.solve(x.T @ x, x.T @ y), rtol=1e-9
    )
