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
