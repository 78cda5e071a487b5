#!/usr/bin/env python
"""Giant implicit-Schur (schur_cg) experiment at beyond-dense-W scale.

Usage:  python scripts/giant_implicit.py stepped|fulljit [ncam] [nlmk] [vis]

Default shape: 512 cameras x 32768 landmarks x 5% visibility ~ 838k
observations — the scale where the FULLY-jitted implicit driver (3-deep
nested while: outer LM loop + inner damping retry + CG) faulted the TPU
worker in round 1 (docs/ROUND1.md).

* ``stepped``: the documented workaround — the outer loop stays in Python
  (``optimize(..., callback=nt.null_callback)``), jitting only
  assemble/iterate (2-deep nesting).
* ``fulljit``: the whole loop in one jit with the fixed-trip-count CG
  (``NLLSTPU_CG_FIXED_ITERS``) replacing the innermost while_loop with a
  fori_loop — testing whether removing one level of dynamic control flow
  avoids the fault.

All timings are readback-fenced (see CLAUDE.md).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import nllstpu as nt  # noqa: E402
from nllstpu.models.ba import make_pinhole_ba, perturb_ba  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "stepped"
NCAM = int(sys.argv[2]) if len(sys.argv) > 2 else 512
NLMK = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
VIS = float(sys.argv[4]) if len(sys.argv) > 4 else 0.05
ITERS = int(os.environ.get("GIANT_ITERS", 5))


def main():
    t_init = time.time()
    float(jnp.zeros(()))  # warm the D2H stream
    print(f"[{time.time()-t_init:7.1f}s] backend={jax.default_backend()}", flush=True)
    problem, cams, lmks = make_pinhole_ba(
        NCAM, NLMK, VIS, noise=1e-3, dtype=jnp.float32, batched="cm"
    )
    perturb_ba(problem, lmks, 0.05, seed=5)
    nobs = sum(b.n for b in problem.batches())
    print(f"[{time.time()-t_init:7.1f}s] problem built: {nobs} obs", flush=True)
    opts = nt.Options(
        iterator=nt.LEVENBERG_MARQUARDT,
        solver="schur_cg",
        schur_family=nt.Euclidean(3),
        max_iters=ITERS,
        rel_dcost=0.0,
        abs_dcost=0.0,
        dstep=1e-12,
        max_fails=1 << 30,
        max_time=1800.0,
        linear_tol=float(os.environ.get("GIANT_LTOL", "0")) or None,
        schur_cluster_size=int(os.environ.get("GIANT_CLUSTER", "0")),
    )
    t0 = time.perf_counter()
    if MODE == "stepped":
        res = nt.optimize(problem, opts, callback=nt.null_callback)
    else:
        res = nt.optimize(problem, opts)
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "mode": MODE,
                "ncam": NCAM,
                "nlmk": NLMK,
                "nobs": int(nobs),
                "cg_fixed": os.environ.get("NLLSTPU_CG_FIXED_ITERS"),
                "linear_tol": os.environ.get("GIANT_LTOL"),
                "cluster": os.environ.get("GIANT_CLUSTER"),
                "iters": res.num_iterations,
                "wall_s": wall,
                "iters_per_sec": res.num_iterations / wall,
                "start_cost": res.start_cost,
                "best_cost": res.best_cost,
                "solves": res.linear_solves,
                "time_gradient": res.time_gradient,
                "time_solver": res.time_solver,
                "termination": res.termination,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
