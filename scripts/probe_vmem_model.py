#!/usr/bin/env python
"""Empirical Mosaic scoped-VMEM accounting probe for the fused_all
accumulate kernel (``fused_obs_all_pm_into``).

Compiles the kernel standalone at the round-4 queue-18 failing bucket
shape (bench-realistic first bucket: lb=197, kb=96, dr_s=9, dl=3,
nrp=128, L=8192 — the shape whose whole-driver compile OOM'd scoped VMEM
at 18.25M/16M, bench_logs/r4_queue18.log) for each candidate lane tile,
and reports compile success + wall time per call.  This is the ground
truth for ``ops/schur._fused_tile_l``'s staging model: the model says
TILE=256 stages ~18.3 MB (OOM) and TILE=128 ~9.2 MB (fits).

Usage: [NLLSTPU_PLATFORM=cpu] python scripts/probe_vmem_model.py
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
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from nllstpu.ops.pallas.fused_obs import fused_obs_all_pm_into
from nllstpu.ops import schur as schur_mod


def _fail_line(e):
    """The informative substring of a Mosaic compile error: the scoped
    allocation size if present, else the first vmem/Mosaic line."""
    msg = str(e)
    import re

    m = re.search(
        r"Scoped allocation with size [^.]*\.[0-9]*M[^.]*\.", msg
    )
    if m:
        return m.group(0)
    return next(
        (
            ln
            for ln in msg.splitlines()
            if "vmem" in ln.lower() or "Mosaic" in ln
        ),
        msg.splitlines()[0] if msg else repr(e),
    )[:300]


def probe(lb, kb, tl, nres=2, dl=3, dr_s=9, nrp=128, L=8192):
    stot = dr_s + dl
    n_r = nrp
    rng = np.random.default_rng(0)
    jac_t = jnp.asarray(
        rng.standard_normal((nres, stot, kb, lb)), jnp.float32
    )
    g0_t = jnp.asarray(rng.standard_normal((stot, kb, lb)), jnp.float32)
    d1 = jnp.ones((kb, lb), jnp.float32)
    d2 = jnp.zeros((kb, lb), jnp.float32)
    vc = jnp.asarray(rng.integers(0, n_r, (kb, lb)), jnp.int32)
    w_full = jnp.zeros((dl, dr_s * nrp, L), jnp.float32)

    def f(jac_t, g0_t, d1, d2, vc, w_full):
        return fused_obs_all_pm_into(
            jac_t, g0_t, d1, d2, vc, w_full, 0, n_r, dr_s, dl, dr_s,
            tile_l=tl,
        )[2]

    model = schur_mod._fused_tile_l(kb, dr_s, dl, nrp, multi=True, nres=nres)
    tag = f"lb={lb} kb={kb} tl={tl} (model picks tl={model})"
    try:
        t0 = time.perf_counter()
        fj = jax.jit(f)
        out = fj(jac_t, g0_t, d1, d2, vc, w_full)
        s = float(jnp.sum(out))  # readback = real fence (CLAUDE.md)
        t_compile = time.perf_counter() - t0
        # timed reps with perturbed inputs (tunneled-backend caveat)
        reps, t_best = 5, float("inf")
        for i in range(reps):
            jac_i = jac_t * (1.0 + 1e-7 * (i + 1))
            t0 = time.perf_counter()
            s2 = float(jnp.sum(fj(jac_i, g0_t, d1, d2, vc, w_full)))
            t_best = min(t_best, time.perf_counter() - t0)
        print(
            f"OK   {tag}: compile {t_compile:.1f}s, "
            f"{t_best*1e3:.3f} ms/call, checksum {s:.3e}/{s2:.3e}",
            flush=True,
        )
    except Exception as e:
        print(f"FAIL {tag}: {_fail_line(e)}", flush=True)


def probe_damped_wide(wc=1152, L=8192, dl=3):
    """Compile + time the column-panelized wide-wc damped reduction
    kernel (reduce_s_lm_damped panel body, VERDICT r5 item 2) at the
    realistic Snavely shape; compare against the XLA chain timing printed
    by profile_realistic (2.8-3.0 ms/solve, r4_queue17/18)."""
    from nllstpu.ops.pallas.schur_reduce import (
        damped_tile_l,
        damped_wide_plan,
        reduce_s_lm_damped,
    )

    plan = damped_wide_plan(dl, wc)
    tag = (
        f"damped_wide wc={wc} L={L} plan={plan} "
        f"(narrow gate {damped_tile_l(dl, wc)})"
    )
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((dl, wc, L)), jnp.float32)
    a = rng.standard_normal((dl, dl, L)).astype(np.float32)
    h_ll = jnp.asarray(
        np.einsum("del,fel->dfl", a, a)
        + 2.0 * np.eye(dl, dtype=np.float32)[:, :, None]
    )
    g_l = jnp.asarray(rng.standard_normal((dl, L)), jnp.float32)

    def f(w, h_ll, g_l, lam):
        s, r, hi = reduce_s_lm_damped(w, h_ll, g_l, lam)
        return jnp.sum(s) + jnp.sum(r) + jnp.sum(hi)

    try:
        t0 = time.perf_counter()
        fj = jax.jit(f)
        s = float(fj(w, h_ll, g_l, jnp.float32(0.01)))
        t_compile = time.perf_counter() - t0
        t_best = float("inf")
        for i in range(5):
            lam_i = jnp.float32(0.01 * (1 + 1e-6 * i))
            t0 = time.perf_counter()
            s2 = float(fj(w, h_ll, g_l, lam_i))
            t_best = min(t_best, time.perf_counter() - t0)
        print(
            f"OK   {tag}: compile {t_compile:.1f}s, {t_best*1e3:.3f} "
            f"ms/call (incl. dispatch+readback), checksum {s:.3e}",
            flush=True,
        )
    except Exception as e:
        print(f"FAIL {tag}: {_fail_line(e)}", flush=True)


def main():
    float(jnp.zeros(()))  # warm the D2H stream
    print(f"backend={jax.default_backend()}", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fused"):
        # Round-5 cap-64 bucket plan points (bench-realistic shape after
        # _OBS_BUCKET_K_CAP=64): largest bucket kb=64@128, small-kb
        # buckets at the 256 tile the corrected gate now picks.
        probe(716, 64, 128)
        probe(1096, 16, 256)
        probe(1916, 4, 256)
        # Model-boundary cross-checks (expect FAIL, with the scoped size
        # printed for model calibration).
        probe(197, 96, 128)
        probe(197, 32, 128)
    if which in ("all", "damped"):
        probe_damped_wide()


if __name__ == "__main__":
    main()
