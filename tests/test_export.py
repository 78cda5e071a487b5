"""Hessian export utilities (BlockSparseMatrix exporter parity)."""

import numpy as np
import jax.numpy as jnp

import nllstpu as nt
from nllstpu.core.optimize import compile_problem
from nllstpu.models.ba import make_affine_ba, perturb_ba
from nllstpu.ops import export


def test_coo_matches_dense():
    p, cams, lmks = make_affine_ba(4, 9, 0.6)
    perturb_ba(p, lmks, 0.05, seed=3)
    compiled = compile_problem(p)
    variables = p.stacked_variables()
    a, b = export.hessian_dense(compiled, variables)
    rows, cols, vals = export.hessian_coo(compiled, variables)
    d = compiled.layout.dof_total
    dense_from_coo = np.zeros((d, d))
    np.add.at(dense_from_coo, (rows, cols), vals)
    np.testing.assert_allclose(dense_from_coo, a, rtol=1e-10, atol=1e-12)


def test_covariance():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 3))
    y = rng.standard_normal(6)
    p = nt.Problem()
    w = p.add_variable(nt.Euclidean(3), np.zeros(3))
    p.add_cost(lambda pr, v: pr[1] @ v - pr[0], (w,), params=(y, x))
    compiled = compile_problem(p)
    cov = export.covariance(compiled, p.stacked_variables())
    np.testing.assert_allclose(cov, np.linalg.inv(x.T @ x), rtol=1e-9)
