#!/usr/bin/env python
"""On-chip benchmark: REALISTIC (skewed-degree) BAL end-to-end — the
round-3 verdict's unproven north-star config.

Usage:  python scripts/bal_realistic.py [ladybug|bench] [direct|implicit] [iters]

Shapes:
  ladybug  49 cams / 7776 pts,  power-law tracks → ~32k obs (BAL Ladybug-49)
  bench    128 cams / 8192 pts, power-law tracks → ~100k obs (headline-scale)

Prints ONE JSON line with iters/sec, converged costs, whether the fused
p-major path ENGAGED (w_pm), the bucket plan and its padding ratio.
Timings are readback-fenced with perturbed inputs (CLAUDE.md).
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

SHAPE = sys.argv[1] if len(sys.argv) > 1 else "ladybug"
BACKEND = sys.argv[2] if len(sys.argv) > 2 else "direct"
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 30


def main():
    float(jnp.zeros(()))  # warm the D2H stream
    if SHAPE == "ladybug":
        data = bal.make_realistic_bal(
            ncameras=49, npoints=7776, seed=1, noise=1e-3, track_alpha=2.3
        )
    else:  # bench-scale: mean track ~12 → ~100k obs at 8192 points
        data = bal.make_realistic_bal(
            ncameras=128, npoints=8192, seed=1, noise=1e-3,
            track_alpha=1.6, max_track=96,
        )
    nobs = len(data["pt_idx"])
    tracks = np.bincount(data["pt_idx"], minlength=data["points"].shape[0])
    cams = np.bincount(data["cam_idx"], minlength=data["cameras"].shape[0])

    problem, cam_h, pt_h = bal.make_bal_problem(data, dtype=jnp.float32)
    perturb_ba(problem, pt_h, 0.05, seed=5)
    solver = "schur" if BACKEND == "direct" else "schur_cg"
    compiled = compile_problem(
        problem, solver=solver, schur_family=bal.PT
    )
    info = compiled.schur_info
    fast = info.fast[0]
    buckets = fast.buckets or (
        ((0, info.num_elim, fast.obs_k, 0),) if fast.obs_k else None
    )
    padded_cols = (
        sum(lb * kb for (_, lb, kb, _) in buckets) if buckets else None
    )
    opts = nt.Options(
        iterator=nt.LEVENBERG_MARQUARDT,
        max_iters=ITERS,
        rel_dcost=0.0,
        abs_dcost=0.0,
        dstep=1e-12,
        max_fails=1 << 30,
        store_trajectory=True,
        linear_tol=1e-2 if BACKEND == "implicit" else None,
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
                final["nsolve"].astype(jnp.float32),
                final["converged"].astype(jnp.float32),
                final["lastcost"].astype(jnp.float32),
            ]
        )
        return jnp.concatenate([head, final["trace"].astype(jnp.float32)])

    runner = jax.jit(run)
    vars0 = problem.stacked_variables()
    t0 = time.perf_counter()
    float(runner(vars0)[0])
    compile_s = time.perf_counter() - t0
    best_rate, wall, stats = 0.0, float("inf"), None
    for i in range(1, 4):
        vars_i = jax.tree.map(lambda x: x * (1.0 + 1e-7 * i), vars0)
        t0 = time.perf_counter()
        out = runner(vars_i)
        run_stats = np.asarray(out, dtype=np.float64)
        run_wall = time.perf_counter() - t0
        if run_stats[0] / run_wall > best_rate:
            best_rate = run_stats[0] / run_wall
            wall, stats = run_wall, run_stats
    n_iter, start, best = int(stats[0]), float(stats[1]), float(stats[2])
    term, lastc = int(stats[4]), float(stats[5])
    trace = stats[6 : 6 + n_iter]
    # Noise-floor target: E[cost] = nobs * noise^2 (2 residual dims, 1/2).
    target = nobs * 1e-6
    tt = None
    for i, c in enumerate(trace):
        if c <= 2.0 * target:
            tt = wall * (i + 1) / n_iter
            break
    print(
        json.dumps(
            {
                "shape": SHAPE,
                "backend": BACKEND,
                "platform": jax.default_backend(),
                "w_dtype": os.environ.get("NLLSTPU_W_DTYPE", "auto"),
                "nobs": nobs,
                "track_mean": round(float(tracks.mean()), 2),
                "track_max": int(tracks.max()),
                "cam_deg_max_over_mean": round(
                    float(cams.max() / cams.mean()), 2
                ),
                "w_pm_engaged": info.w_pm is not None,
                "n_buckets": None if buckets is None else len(buckets),
                "bucket_plan": None
                if buckets is None
                else [[int(x) for x in b] for b in buckets],
                "pad_ratio": None
                if padded_cols is None
                else round(padded_cols / nobs, 3),
                "iters_per_sec": round(best_rate, 2),
                "iters": n_iter,
                "wall_s": round(wall, 4),
                "compile_s": round(compile_s, 1),
                "start_cost": start,
                "best_cost": best,
                "termination_bits": bin(term),
                "last_cost": lastc,
                "trace_tail": [float(v) for v in trace[-4:]],
                "noise_floor_target": target,
                "time_to_2x_floor_s": tt,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
