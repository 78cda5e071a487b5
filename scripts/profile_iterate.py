#!/usr/bin/env python
"""In-loop timing of full LM outer iterations and their non-solve pieces.

Complements scripts/profile_solve_phases.py: measures apply_step, quad,
diag_max, grad, and one complete ``iterate('levenberg_marquardt', ...)``
(inner accept loop + λ bookkeeping) under a fori_loop with data-dependent
inputs, plus the full run_loop at max_iters for an end-to-end ms/iter.

Usage: python scripts/profile_iterate.py [ncam] [nlmk] [vis] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import nllstpu as nt
from nllstpu.core import iterators
from nllstpu.core.optimize import compile_problem, run_loop
from nllstpu.models.ba import make_pinhole_ba, perturb_ba

NCAM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NLMK = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
VIS = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 50


def bench_loop(name, body0, reps=REPS):
    """Readback-fenced best-of-3 of a fori_loop over ``body0(i, acc)``."""
    f = jax.jit(
        lambda: jax.lax.fori_loop(0, reps, body0, jnp.zeros((), jnp.float32))
    )
    float(f())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>22}: {best / reps * 1000:7.3f} ms/call")
    return best / reps


def main():
    float(jnp.zeros(()))
    problem, cams, lmks = make_pinhole_ba(
        NCAM, NLMK, VIS, noise=1e-3, dtype=jnp.float32, batched="cm"
    )
    perturb_ba(problem, lmks, 0.05, seed=5)
    compiled = compile_problem(
        problem, solver="schur", schur_family=nt.Euclidean(3)
    )
    ctx = compiled.ctx()
    ops = ctx.ops()
    vars0 = problem.stacked_variables()
    _, sys0 = jax.jit(compiled.assemble)(vars0)
    c0 = jax.jit(compiled.cost)(vars0)
    dim = ctx.dim
    print(f"backend={jax.default_backend()} dim={dim} reps={REPS}")

    def perturbed_x(i, acc):
        return (
            jnp.full((dim,), 1e-4, jnp.float32)
            * (1 + 1e-5 * i.astype(jnp.float32) + 1e-9 * acc)
        )

    def b_apply(i, acc):
        x = perturbed_x(i, acc)
        nv = ctx.apply(vars0, x)
        return acc + jax.tree.leaves(nv)[0].ravel()[0].astype(jnp.float32) * 1e-20

    def b_quad(i, acc):
        x = perturbed_x(i, acc)
        return acc + ops.quad(sys0, x).astype(jnp.float32) * 1e-20

    def b_grad(i, acc):
        g = ops.grad(sys0)
        return acc + (g[0] * (1e-20 * (1 + 1e-9 * acc + i))).astype(jnp.float32)

    def b_diag_max(i, acc):
        d = ops.diag_max(sys0)
        return acc + (d * (1e-20 * (1 + 1e-9 * acc + i))).astype(jnp.float32)

    def b_apply_cost(i, acc):
        x = perturbed_x(i, acc)
        nv = ctx.apply(vars0, x)
        return acc + ctx.cost(nv).astype(jnp.float32) * 1e-20

    def b_iterate(i, acc):
        data = iterators.init_data(jnp.float32, nt.Options())
        data = dict(data, lm_lambda=jnp.float32(0.1) * (1 + 1e-5 * i + 1e-9 * acc))
        nv, c, x, data, ns, nc = iterators.iterate(
            "levenberg_marquardt", ctx, sys0, vars0, c0, data, nt.Options()
        )
        return acc + c.astype(jnp.float32) * 1e-20

    bench_loop("apply_step", b_apply)
    bench_loop("quad", b_quad)
    bench_loop("grad", b_grad)
    bench_loop("diag_max", b_diag_max)
    bench_loop("apply+cost", b_apply_cost)
    bench_loop("LM iterate (fixed sys)", b_iterate)

    # End-to-end run_loop ms/iter for reference.
    opts = nt.Options(
        max_iters=15, rel_dcost=0.0, abs_dcost=0.0, dstep=1e-12,
        max_fails=1 << 30,
    )

    def run(v):
        f = run_loop(compiled.assemble, compiled.cost, ctx, opts, v)
        return jnp.stack(
            [f["iternum"].astype(jnp.float32), f["nsolve"].astype(jnp.float32),
             f["bestcost"].astype(jnp.float32)]
        )

    r = jax.jit(run)
    float(r(vars0)[0])
    best = float("inf")
    for i in range(1, 4):
        vi = jax.tree.map(lambda x: x * (1 + 1e-7 * i), vars0)
        t0 = time.perf_counter()
        out = np.asarray(r(vi))
        best = min(best, time.perf_counter() - t0)
    it, ns, bc = out
    print(
        f"{'run_loop':>22}: {best * 1000:7.1f} ms | {it:.0f} iters "
        f"({best / it * 1000:6.2f} ms/iter) | {ns:.0f} solves | best {bc:.3e}"
    )


if __name__ == "__main__":
    main()
