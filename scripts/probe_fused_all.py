#!/usr/bin/env python
"""On-chip validation + assemble timing of NLLSTPU_W_IMPL=fused_all.

Builds the bench-scale problem once, then per impl (onehot, fused,
fused_all — optionally with NLLSTPU_W_DTYPE=bf16 legs) compiles the
assemble, checks fused_all's full system against the onehot reference
(single packed readback of max-abs-diff scalars), and times a 50-rep
jitted fori assemble loop with every output consumed (DCE — CLAUDE.md).

Usage: [NLLSTPU_PLATFORM=cpu] python scripts/probe_fused_all.py \
           [ncam] [nlmk] [vis] [reps]
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
    "jax_default_matmul_precision", os.environ.get("MATMUL_PREC", "highest")
)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import nllstpu as nt
from nllstpu.core.optimize import compile_problem
from nllstpu.models.ba import make_pinhole_ba, perturb_ba

NCAM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NLMK = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
VIS = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 50
ON_TPU = jax.default_backend() == "tpu"
SUFFIX = "" if ON_TPU else "_interpret"


def main():
    float(jnp.zeros(()))  # warm the D2H stream
    problem, cams, lmks = make_pinhole_ba(
        NCAM, NLMK, VIS, noise=1e-3, dtype=jnp.float32, batched="cm"
    )
    perturb_ba(problem, lmks, 0.05, seed=5)
    vars0 = problem.stacked_variables()
    print(f"backend={jax.default_backend()} ncam={NCAM} nlmk={NLMK} vis={VIS}")

    def build(impl, wdt):
        os.environ["NLLSTPU_W_DTYPE"] = wdt
        if impl == "onehot":
            # Explicit: since round 3 the unset default resolves to
            # fused_all on TPU.
            os.environ["NLLSTPU_W_IMPL"] = "onehot"
        else:
            os.environ["NLLSTPU_W_IMPL"] = impl + SUFFIX
        c = compile_problem(
            problem, solver="schur", schur_family=nt.Euclidean(3)
        )
        return c

    # --- correctness: fused_all vs onehot, f32 W ---------------------------
    c_ref = build("onehot", "f32")
    cost_ref, sys_ref = jax.jit(c_ref.assemble)(vars0)
    c_fa = build("fused_all", "f32")
    assert c_fa.schur_info.w_pm is not None, "fused_all did not engage"
    cost_fa, sys_fa = jax.jit(c_fa.assemble)(vars0)
    _, _, _, pm_of_std = c_fa.schur_info.w_pm

    def relmax(a, b):
        scale = jnp.maximum(jnp.max(jnp.abs(b)), 1e-30)
        return jnp.max(jnp.abs(a - b)) / scale

    w_std = jnp.transpose(sys_fa[4], (0, 2, 1))[:, :, jnp.asarray(pm_of_std)]
    diffs = jnp.stack(
        [relmax(a, b) for a, b in zip(sys_fa[:4], sys_ref[:4])]
        + [relmax(w_std, sys_ref[4]),
           relmax(cost_fa, cost_ref)]
    )
    d = np.asarray(diffs)
    names = ["a_rr", "b_r", "h_ll", "g_l", "W", "cost"]
    print("fused_all vs onehot relmax:",
          " ".join(f"{n}={v:.3e}" for n, v in zip(names, d)))
    ok = bool(np.all(d < 2e-5))
    print("VALIDATION", "OK" if ok else "FAILED")

    # --- assemble timing per impl ------------------------------------------
    for impl, wdt in (
        ("onehot", "f32"), ("onehot", "bf16"),
        ("fused", "bf16"),
        ("fused_all", "f32"), ("fused_all", "bf16"),
    ):
        c = build(impl, wdt)

        def loop():
            def body(i, acc):
                v = jax.tree.map(
                    lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), vars0
                )
                cc, s = c.assemble(v)
                used = sum(
                    jnp.sum(leaf).astype(jnp.float32)
                    for leaf in jax.tree.leaves(s)
                )
                return acc + (cc.astype(jnp.float32) + used) * 1e-20 \
                    + 1e-6 * i.astype(jnp.float32)

            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

        f = jax.jit(loop)
        float(f())  # compile + fence
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        print(f"assemble[{impl}/{wdt}]: {best / REPS * 1000:7.3f} ms/call",
              flush=True)


if __name__ == "__main__":
    main()
