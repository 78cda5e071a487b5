#!/usr/bin/env python
"""On-chip benchmark: adaptive-robustified BAL (ContaminatedGaussian
jointly optimized with cameras+points) on the Schur fast path — the
round-3 verdict's item 5 "measured on-chip iteration time at >=30k obs".

Usage:  python scripts/adaptive_bal_bench.py [iters]

Prints ONE JSON line: iters/sec, costs, recovered mixture params, and
whether the batch rode the adaptive fast tables (kernel_rows set).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
if os.environ.get("NLLSTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NLLSTPU_PLATFORM"])
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import nllstpu as nt
from nllstpu.core.optimize import compile_problem, run_loop
from nllstpu.models import bal
from nllstpu.models.ba import perturb_ba

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def main():
    float(jnp.zeros(()))
    data = bal.make_realistic_bal(
        ncameras=49, npoints=7776, seed=1, noise=1e-3, track_alpha=2.3
    )
    nobs = len(data["pt_idx"])
    # 1-in-12 gross outliers — the adaptive kernel's reason to exist.
    rng = np.random.default_rng(9)
    out = rng.choice(nobs, size=nobs // 12, replace=False)
    data["observations"][out] += 200.0

    kern = nt.ContaminatedGaussian()
    kp0 = nt.ContaminatedGaussian.make_params(0.5, 50.0, 0.7)
    problem, cams, pts, kh = bal.make_bal_problem(
        data, dtype=jnp.float32, kernel=kern, kernel_params=kp0
    )
    perturb_ba(problem, pts, 0.02, seed=5)
    compiled = compile_problem(problem, solver="schur", schur_family=bal.PT)
    f = compiled.schur_info.fast[0]
    opts = nt.Options(
        iterator=nt.LEVENBERG_MARQUARDT,
        max_iters=ITERS,
        rel_dcost=0.0,
        abs_dcost=0.0,
        dstep=1e-12,
        max_fails=1 << 30,
    )

    def run(v):
        final = run_loop(
            compiled.assemble, compiled.cost, compiled.ctx(opts), opts, v
        )
        head = jnp.stack(
            [
                final["iternum"].astype(jnp.float32),
                final["startcost"].astype(jnp.float32),
                final["bestcost"].astype(jnp.float32),
            ]
        )
        kfam = nt.family_name(kern.manifold)
        return jnp.concatenate([head, final["variables"][kfam][0]])

    runner = jax.jit(run)
    vars0 = problem.stacked_variables()
    t0 = time.perf_counter()
    float(runner(vars0)[0])
    compile_s = time.perf_counter() - t0
    best_rate, wall, stats = 0.0, float("inf"), None
    for i in range(1, 4):
        vars_i = jax.tree.map(lambda x: x * (1.0 + 1e-7 * i), vars0)
        t0 = time.perf_counter()
        out_arr = np.asarray(runner(vars_i), dtype=np.float64)
        run_wall = time.perf_counter() - t0
        if out_arr[0] / run_wall > best_rate:
            best_rate, wall, stats = out_arr[0] / run_wall, run_wall, out_arr
    kparams = stats[3:6]
    sw = [1.0 / kparams[0], 1.0 / kparams[1], kparams[2]]
    print(
        json.dumps(
            {
                "model": "adaptive_bal_cg_kernel",
                "platform": jax.default_backend(),
                "nobs": nobs,
                "fast_adaptive": f is not None and f.kernel_rows is not None,
                "iters_per_sec": round(best_rate, 2),
                "iters": int(stats[0]),
                "wall_s": round(wall, 4),
                "compile_s": round(compile_s, 1),
                "start_cost": stats[1],
                "best_cost": stats[2],
                "recovered_sigma1_sigma2_w": [round(v, 4) for v in sw],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
