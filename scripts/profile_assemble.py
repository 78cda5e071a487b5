#!/usr/bin/env python
"""Split the direct-Schur assemble into its two Jacobian evaluations vs
everything else (reductions + W placement) at bench scale.

The round-2 on-chip A/B found the Pallas W-placement/solve kernels moved
end-to-end throughput by ~0 despite eliminating ~205 MB/iter of analytical
traffic — this measures whether assemble is actually dominated by the
residual+jacfwd evaluations themselves (obs-major + camera-major legs,
ops/schur.py _assemble_fast_dual), which no W-side kernel can touch.

Legs (each a jitted fori_loop of REPS calls, every output consumed, inputs
perturbed per rep — see CLAUDE.md for why):
    cost       residual pass only (engine.total_cost)
    jac_obs    batch_res_jac_cm on the obs-major batch
    jac_cam    batch_res_jac_cm on the camera-major repack
    assemble   the full thing (reductions+W = assemble - jac_obs - jac_cam)

Usage: [NLLSTPU_PLATFORM=cpu] python scripts/profile_assemble.py \
           [ncam] [nlmk] [vis] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

if os.environ.get("NLLSTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NLLSTPU_PLATFORM"])

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import nllstpu as nt
from nllstpu.core import engine
from nllstpu.core.optimize import compile_problem
from nllstpu.models.ba import make_pinhole_ba, perturb_ba

NCAM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NLMK = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
VIS = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 50


def consume(tree):
    return sum(
        jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(tree)
    )


def main():
    float(jnp.zeros(()))  # warm the D2H stream
    problem, cams, lmks = make_pinhole_ba(
        NCAM, NLMK, VIS, noise=1e-3, dtype=jnp.float32, batched="cm"
    )
    perturb_ba(problem, lmks, 0.05, seed=5)
    compiled = compile_problem(
        problem, solver="schur", schur_family=nt.Euclidean(3)
    )
    info = compiled.schur_info
    vars0 = problem.stacked_variables()
    dtype = compiled.dtype

    # The single landmark-touching batch and its camera-major repack.
    (bi,) = [
        i
        for i, b in enumerate(compiled.batches)
        if any(m.dof == 3 for m in b.manifolds)
    ]
    batch = compiled.batches[bi]
    cam_batch = info.fast[bi].cam_batch

    legs = {
        "cost": lambda v: compiled.cost(v).astype(jnp.float32),
        "jac_obs": lambda v: consume(engine.batch_res_jac_cm(batch, v, dtype)),
        "jac_cam": lambda v: consume(
            engine.batch_res_jac_cm(cam_batch, v, dtype)
        ),
        "assemble": lambda v: consume(compiled.assemble(v)),
    }

    knobs = " ".join(
        f"{k.split('_', 1)[1].lower()}={os.environ.get(k, '-')}"
        for k in ("NLLSTPU_W_IMPL", "NLLSTPU_SOLVE_IMPL", "NLLSTPU_W_DTYPE")
    )
    print(
        f"backend={jax.default_backend()} ncam={NCAM} nlmk={NLMK} vis={VIS}"
        f" reps={REPS} {knobs}"
    )
    times = {}
    for name, fn in legs.items():
        def loop(fn=fn):
            def body(i, acc):
                v = jax.tree.map(
                    lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), vars0
                )
                return acc + fn(v) * 1e-20 + 1e-6 * i.astype(jnp.float32)

            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

        f = jax.jit(loop)
        float(f())  # compile + fence
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        times[name] = best / REPS * 1000
        print(f"{name:>9}: {times[name]:7.3f} ms/call")
    red = times["assemble"] - times["jac_obs"] - times["jac_cam"]
    print(f"{'reduct+W':>9}: {red:7.3f} ms/call  (assemble - both jac legs)")


if __name__ == "__main__":
    main()
