"""Multi-device tests on the virtual 8-device CPU mesh: sharded assembly must
reproduce the single-device system bit-for-bit (psum of disjoint partial
sums), and the full sharded optimization must reach the reference cost
targets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nllstpu as nt
from nllstpu.core.optimize import compile_problem, run_loop
from nllstpu.models.ba import make_affine_ba, perturb_ba
from nllstpu.parallel.mesh import make_mesh, parallelize

LMK = nt.Euclidean(3)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("solver,schur_family", [("dense", None), ("schur", LMK)])
def test_sharded_assembly_matches(solver, schur_family):
    p, cams, lmks = make_affine_ba(6, 20, 0.5)
    perturb_ba(p, lmks, 0.05, seed=3)
    compiled = compile_problem(p, solver=solver, schur_family=schur_family)
    mesh = make_mesh(8)
    par = parallelize(compiled, mesh)
    variables = p.stacked_variables()
    c1, sys1 = jax.jit(compiled.assemble)(variables)
    c2, sys2 = jax.jit(par.assemble)(variables)
    np.testing.assert_allclose(c1, c2, rtol=1e-12)
    for l1, l2 in zip(jax.tree.leaves(sys1), jax.tree.leaves(sys2)):
        np.testing.assert_allclose(l1, l2, rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_full_optimize(n_devices):
    p, cams, lmks = make_affine_ba(10, 50, 0.3)
    perturb_ba(p, lmks, 0.001, seed=3)
    perturb_ba(p, cams, 0.001, seed=4)
    compiled = compile_problem(p, solver="schur", schur_family=LMK)
    par = parallelize(compiled, make_mesh(n_devices))
    opts = nt.Options()
    final = jax.jit(
        lambda v: run_loop(par.assemble, par.cost, par.ctx(), opts, v)
    )(p.stacked_variables())
    assert float(final["bestcost"]) < 1e-15
