#!/usr/bin/env python
"""Phase breakdown (assemble / ops.solve / cost) at the REALISTIC
skewed-degree BAL shapes — the numbers that decide which solve lever
matters on real problem shapes (the Snavely 9-dof camera family gets
wc = 9*nrp >= 1152 and is gated off the damped reduction kernel; this
measures what that costs).

Usage: python scripts/profile_realistic.py [ladybug|bench] [reps]

Same timing discipline as profile_solve_phases.py: fori_loop with traced
lambda/perturbed inputs, readback-fenced.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("NLLSTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NLLSTPU_PLATFORM"])
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import nllstpu as nt
from nllstpu.core.optimize import compile_problem
from nllstpu.models import bal
from nllstpu.models.ba import perturb_ba

SHAPE = sys.argv[1] if len(sys.argv) > 1 else "bench"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50


def main():
    float(jnp.zeros(()))
    if SHAPE == "ladybug":
        data = bal.make_realistic_bal(
            ncameras=49, npoints=7776, seed=1, noise=1e-3, track_alpha=2.3
        )
    else:
        data = bal.make_realistic_bal(
            ncameras=128, npoints=8192, seed=1, noise=1e-3,
            track_alpha=1.6, max_track=96,
        )
    problem, cam_h, pt_h = bal.make_bal_problem(data, dtype=jnp.float32)
    perturb_ba(problem, pt_h, 0.05, seed=5)
    compiled = compile_problem(problem, solver="schur", schur_family=bal.PT)
    ops = compiled.schur_info.ops()
    vars0 = problem.stacked_variables()
    _, sys0 = jax.jit(compiled.assemble)(vars0)
    print(
        f"backend={jax.default_backend()} shape={SHAPE} reps={REPS}"
        f" nobs={len(data['pt_idx'])} pm={'y' if ops.pm is not None else 'n'}"
        f" w_shape={tuple(sys0[4].shape)}"
        f" solve_impl={os.environ.get('NLLSTPU_SOLVE_IMPL', '-')}"
        f" w_dtype={os.environ.get('NLLSTPU_W_DTYPE', '-')}"
    )

    def ops_solve_loop():
        def body(i, acc):
            lam = 0.1 * (1.0 + 1e-5 * i.astype(jnp.float32)) + 1e-9 * acc
            x = ops.solve(sys0, lam.astype(sys0[0].dtype))
            return acc + jnp.sum(x).astype(jnp.float32) * 1e-20 + 1e-6 * i.astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    def assemble_loop():
        def body(i, acc):
            v = jax.tree.map(
                lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), vars0
            )
            c, s = compiled.assemble(v)
            used = sum(
                jnp.sum(leaf).astype(jnp.float32)
                for leaf in jax.tree.leaves(s)
            )
            return acc + (c.astype(jnp.float32) + used) * 1e-20 + 1e-6 * i.astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    def cost_loop():
        def body(i, acc):
            v = jax.tree.map(
                lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), vars0
            )
            return acc + compiled.cost(v).astype(jnp.float32) * 1e-20 + 1e-6 * i.astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    for name, fn in (
        ("ops.solve", ops_solve_loop),
        ("assemble", assemble_loop),
        ("cost", cost_loop),
    ):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        float(f())  # compile + fence
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name:>12}: {best / REPS * 1000:7.3f} ms/call"
            f"  (compile {compile_s:.1f}s)"
        )


if __name__ == "__main__":
    main()
