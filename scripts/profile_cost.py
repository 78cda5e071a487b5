#!/usr/bin/env python
"""Micro-profile of the residual cost pass at bench scale: is the ~1 ms
cost leg gather-bound (lane-axis gathers in _gather_vals_cm — CLAUDE.md
flags minor-axis gathers as slow) or compute-bound?

Legs (jitted fori loops, perturbed inputs, outputs consumed):
    cost          full compiled.cost
    gather_cm     the _gather_vals_cm gathers alone
    gather_rowT   alternative: row (sublane) gather [B, ambient] + transpose
    resid_only    residual+rho from pre-gathered constants (no gathers)

Usage: [NLLSTPU_PLATFORM=cpu] python scripts/profile_cost.py [ncam] [nlmk] [vis] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

if os.environ.get("NLLSTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NLLSTPU_PLATFORM"])
jax.config.update(
    "jax_default_matmul_precision", os.environ.get("MATMUL_PREC", "highest")
)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import nllstpu as nt
from nllstpu.core import engine
from nllstpu.core.problem import family_name
from nllstpu.core.optimize import compile_problem
from nllstpu.models.ba import make_pinhole_ba, perturb_ba

NCAM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NLMK = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
VIS = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 50


def main():
    float(jnp.zeros(()))
    problem, cams, lmks = make_pinhole_ba(
        NCAM, NLMK, VIS, noise=1e-3, dtype=jnp.float32, batched="cm"
    )
    perturb_ba(problem, lmks, 0.05, seed=5)
    compiled = compile_problem(
        problem, solver="schur", schur_family=nt.Euclidean(3)
    )
    vars0 = problem.stacked_variables()
    batch = compiled.batches[0]
    print(f"backend={jax.default_backend()} ncam={NCAM} nlmk={NLMK} "
          f"vis={VIS} reps={REPS} n_padded={batch.n_padded}")

    gath0 = jax.jit(
        lambda v: engine._gather_vals_cm(batch, v)
    )(vars0)
    gath0 = jax.tree.map(jnp.asarray, gath0)

    def consume(tree):
        return sum(
            jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(tree)
        )

    def timeit(name, body):
        def loop():
            def b(i, acc):
                return acc + body(acc) * 1e-20 + 1e-6 * i.astype(jnp.float32)

            return jax.lax.fori_loop(0, REPS, b, jnp.zeros((), jnp.float32))

        f = jax.jit(loop)
        float(f())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        print(f"{name:>12}: {best / REPS * 1000:7.3f} ms/call", flush=True)

    def perturb(acc):
        return jax.tree.map(
            lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), vars0
        )

    timeit("cost", lambda acc: compiled.cost(perturb(acc)).astype(jnp.float32))
    timeit(
        "gather_cm",
        lambda acc: consume(engine._gather_vals_cm(batch, perturb(acc))),
    )

    def gather_rowT(acc):
        v = perturb(acc)
        out = []
        for m, idx in zip(batch.manifolds, batch.idx):
            arr = v[family_name(m)]
            rows = arr.reshape(arr.shape[0], -1)[idx]  # [B, ambient]
            out.append(rows.T)
        return consume(out)

    timeit("gather_rowT", gather_rowT)

    def gather_slot(acc, slot):
        v = perturb(acc)
        m, idx = batch.manifolds[slot], batch.idx[slot]
        arr = v[family_name(m)]
        flat = arr.reshape(arr.shape[0], -1).T
        return consume([flat[:, idx]])

    for slot, m in enumerate(batch.manifolds):
        timeit(
            f"gather[{slot}:{type(m).__name__}]",
            lambda acc, s=slot: gather_slot(acc, s),
        )

    # Broadcast-runs alternative for the eliminated slot of an obs-major
    # batch: gather once per landmark, broadcast over the run.
    fast0 = compiled.schur_info.fast[0]
    if fast0 is not None and fast0.obs_k is not None:
        kk = fast0.obs_k
        e = 1 - fast0.r_slot
        L = compiled.schur_info.num_elim
        lmk_vars = np.asarray(batch.idx[e])[: L * kk : kk]  # [L]
        tail = np.asarray(batch.idx[e])[L * kk :]

        def gather_bcast(acc):
            v = perturb(acc)
            m = batch.manifolds[e]
            arr = v[family_name(m)]
            flat = arr.reshape(arr.shape[0], -1).T  # [ambient, n]
            runs = flat[:, jnp.asarray(lmk_vars)]  # [ambient, L]
            runs = jnp.broadcast_to(
                runs[:, :, None], runs.shape + (kk,)
            ).reshape(runs.shape[0], L * kk)
            rest = flat[:, jnp.asarray(tail)]
            return consume([jnp.concatenate([runs, rest], axis=1)])

        timeit("gather_bcast", gather_bcast)

    def resid_only(acc):
        g = jax.tree.map(
            lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), gath0
        )
        r = batch.fn(batch.params, *g)
        sq = jnp.sum(r * r, axis=0)
        costs = 0.5 * batch.kernel.rho(sq)
        return jnp.sum(
            jnp.where(batch.mask, costs, jnp.zeros_like(costs))
        ).astype(jnp.float32)

    timeit("resid_only", resid_only)


if __name__ == "__main__":
    main()
