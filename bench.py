#!/usr/bin/env python
"""Headline benchmark: Levenberg-Marquardt iterations/sec on synthetic
SE(3)+pinhole bundle adjustment with the Schur-complement backend.

The reference publishes no numbers (BASELINE.md), so the recorded baseline is
this machine's CPU running the identical workload; ``vs_baseline`` is the
TPU/CPU speedup.  Prints ONE JSON line.

Workload: 128 SE(3) cameras (768 reduced dims), 8192 landmarks, ~105k
observations (10% banded visibility), float32, measurement noise 1e-3,
landmarks perturbed 0.05 — a BAL-Venice-flavored shape scaled to one chip.
"""

import json
import os
import sys
import time

# Make the CPU backend available alongside the TPU for the baseline leg.
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

import nllstpu as nt  # noqa: E402
from nllstpu.core.optimize import compile_problem, run_loop  # noqa: E402
from nllstpu.models.ba import make_pinhole_ba, perturb_ba  # noqa: E402

NCAM = int(os.environ.get("BENCH_NCAM", 128))
NLMK = int(os.environ.get("BENCH_NLMK", 8192))
VIS = float(os.environ.get("BENCH_VIS", 0.1))
ITERS = int(os.environ.get("BENCH_ITERS", 15))


def build():
    problem, cams, lmks = make_pinhole_ba(
        ncameras=NCAM,
        nlandmarks=NLMK,
        prop_visible=VIS,
        noise=1e-3,
        dtype=jnp.float32,
    )
    perturb_ba(problem, lmks, 0.05, seed=5)
    compiled = compile_problem(problem, solver="schur", schur_family=nt.Euclidean(3))
    return problem, compiled


def bench_on(device, iters):
    with jax.default_device(device):
        problem, compiled = build()
        opts = nt.Options(
            iterator=nt.LEVENBERG_MARQUARDT,
            max_iters=iters,
            rel_dcost=0.0,
            abs_dcost=0.0,
            dstep=1e-12,
            max_fails=1 << 30,
        )
        runner = jax.jit(
            lambda v: run_loop(compiled.assemble, compiled.cost, compiled.ctx(), opts, v)
        )
        vars0 = problem.stacked_variables()
        t0 = time.perf_counter()
        warm = jax.block_until_ready(runner(vars0))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        final = jax.block_until_ready(runner(vars0))
        wall = time.perf_counter() - t0
        n_iter = int(final["iternum"])
        start, best = float(final["startcost"]), float(final["bestcost"])
        assert best < start, (start, best)  # sanity: LM actually descends
        return {
            "iters_per_sec": n_iter / wall,
            "iters": n_iter,
            "wall_s": wall,
            "compile_s": compile_s,
            "start_cost": start,
            "best_cost": best,
            "solves": int(final["nsolve"]),
        }


def main():
    backend = jax.default_backend()
    main_dev = jax.devices()[0]
    main_stats = bench_on(main_dev, ITERS)
    value = main_stats["iters_per_sec"]

    vs_baseline = 1.0
    if backend != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
            cpu_stats = bench_on(cpu, min(ITERS, 5))
            if cpu_stats["iters_per_sec"] > 0:
                vs_baseline = value / cpu_stats["iters_per_sec"]
        except Exception as e:  # CPU leg is best-effort
            print(f"# cpu baseline failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"lm_iters_per_sec_pinhole_ba_{NCAM}cam_{NLMK}lmk_f32_schur",
                "value": round(value, 3),
                "unit": "iter/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
