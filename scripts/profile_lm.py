#!/usr/bin/env python
"""Profile LM iteration throughput per iterator on the current backend.

Usage:  python scripts/profile_lm.py [ncam] [nlmk] [vis]

Timings are readback-fenced with perturbed inputs (see CLAUDE.md for why
both matter on tunneled TPU backends).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# The env var alone is overridden by sitecustomize (CLAUDE.md).
if os.environ.get("NLLSTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NLLSTPU_PLATFORM"])
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import nllstpu as nt
from nllstpu.core.optimize import compile_problem, run_loop
from nllstpu.models.ba import make_pinhole_ba, perturb_ba

NCAM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NLMK = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
VIS = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1


def main():
    float(jnp.zeros(()))  # warm the D2H stream
    problem, cams, lmks = make_pinhole_ba(
        NCAM, NLMK, VIS, noise=1e-3, dtype=jnp.float32, batched="cm"
    )
    perturb_ba(problem, lmks, 0.05, seed=5)
    compiled = compile_problem(
        problem, solver="schur", schur_family=nt.Euclidean(3)
    )
    vars0 = problem.stacked_variables()
    print(problem)

    for iterator in (
        nt.GRADIENT_DESCENT, nt.NEWTON, nt.DOGLEG, nt.LEVENBERG_MARQUARDT,
    ):
        opts = nt.Options(
            iterator=iterator, max_iters=15, rel_dcost=0.0, abs_dcost=0.0,
            dstep=1e-12, max_fails=1 << 30,
        )

        def run(v, opts=opts):
            f = run_loop(compiled.assemble, compiled.cost, compiled.ctx(), opts, v)
            return jnp.stack(
                [f["iternum"].astype(jnp.float32),
                 f["nsolve"].astype(jnp.float32),
                 f["ncost"].astype(jnp.float32),
                 f["bestcost"].astype(jnp.float32)]
            )

        r = jax.jit(run)
        float(r(vars0)[0])  # compile + fence
        best = float("inf")
        for i in range(1, 3):
            vi = jax.tree.map(lambda x: x * (1 + 1e-7 * i), vars0)
            t0 = time.perf_counter()
            out = np.asarray(r(vi))
            best = min(best, time.perf_counter() - t0)
        it, ns, nc, bc = out
        print(
            f"{iterator:>22}: {best*1000:7.1f} ms | {it:.0f} iters "
            f"({best/it*1000:6.2f} ms/iter) | {ns:.0f} solves | "
            f"{nc:.0f} cost evals | best {bc:.3e}"
        )


if __name__ == "__main__":
    main()
