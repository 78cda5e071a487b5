#!/usr/bin/env python
"""Decompose the direct-Schur W leg at bench scale: robust-block compose,
K-major transpose, Pallas placement kernel, XLA one-hot contraction.

Cumulative in-loop legs (adjacent differences are the stage costs):
    he_hll     he robust block + h_ll/g_l reductions (no W at all)
    +we_b      + the [Sr, dl, B] W-coupling robust block
    +we3_T     + the K-major transpose feeding place_w_pm
    +kernel    + the Pallas placement kernel (full pallas W leg)
    onehot     he_hll + we_b + the XLA one-hot contraction + placement

Usage: [NLLSTPU_PLATFORM=cpu] python scripts/profile_wleg.py [reps]
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
from nllstpu.core import engine
from nllstpu.core.optimize import compile_problem
from nllstpu.models.ba import make_pinhole_ba, perturb_ba

NCAM, NLMK, VIS = 128, 8192, 0.1
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def main():
    float(jnp.zeros(()))
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
    (bi,) = [
        i
        for i, b in enumerate(compiled.batches)
        if any(m.dof == 3 for m in b.manifolds)
    ]
    batch = compiled.batches[bi]
    fast = info.fast[bi]
    L, dl = info.num_elim, info.dof_elim
    k = fast.obs_k
    n_r = fast.n_r
    dofs = [m.dof for m in batch.manifolds]
    eslot = [
        i for i, m in enumerate(batch.manifolds) if m.dof == dl
    ][0]
    start = sum(dofs[:eslot])
    sel_e = np.arange(start, start + dl)
    sel_r = np.array(
        [i for i in range(sum(dofs)) if not (start <= i < start + dl)],
        dtype=np.int64,
    )
    dr_s = len(sel_r)
    nrp = -(-n_r // 128) * 128

    def robust_block(jac, g0, d1m, d2m, sa, sb):
        ja = jac[:, sa, :]
        jb = jac[:, sb, :]
        jj = jnp.einsum("npb,nqb->pqb", ja, jb)
        return jj * d1m + d2m * (g0[sa][:, None, :] * g0[sb][None, :, :])

    def prep(v):
        raw = engine.batch_res_jac_cm(batch, v, dtype)
        cost_sum, r, jac, g0, d1, d2, _ = raw
        mval = jnp.asarray(batch.mask).astype(dtype)
        return jac, g0, d1 * mval, 2.0 * d2 * mval

    def runs(x):
        return x[..., : L * k].reshape(x.shape[:-1] + (L, k))

    def leg(v, upto):
        jac, g0, d1m, d2m = prep(v)
        acc = jnp.zeros((), jnp.float32)
        he = robust_block(jac, g0, d1m, d2m, sel_e, sel_e)
        h_ll = jnp.sum(runs(he), axis=-1)
        g_l = jnp.sum(runs(g0[sel_e] * d1m), axis=-1)
        acc += (jnp.sum(h_ll) + jnp.sum(g_l)).astype(jnp.float32)
        if upto >= 2:
            we_b = robust_block(jac, g0, d1m, d2m, sel_r, sel_e)
            acc += jnp.sum(we_b).astype(jnp.float32)
        if upto >= 3:
            we3 = (
                we_b[:, :, : L * k]
                .reshape(dr_s, dl, L, k)
                .transpose(3, 1, 0, 2)
                .reshape(k, dl * dr_s, L)
            )
            acc += jnp.sum(we3).astype(jnp.float32)
        if upto >= 4:
            from nllstpu.ops.pallas.w_place import place_w_pm

            vc2 = jnp.asarray(fast.rvid)[: L * k].reshape(L, k).T
            w = place_w_pm(
                we3, vc2, n_r, dr_s, dl,
                interpret=jax.default_backend() != "tpu",
            )
            acc += jnp.sum(w).astype(jnp.float32)
        return acc

    def leg_onehot(v):
        jac, g0, d1m, d2m = prep(v)
        acc = jnp.zeros((), jnp.float32)
        he = robust_block(jac, g0, d1m, d2m, sel_e, sel_e)
        h_ll = jnp.sum(runs(he), axis=-1)
        g_l = jnp.sum(runs(g0[sel_e] * d1m), axis=-1)
        acc += (jnp.sum(h_ll) + jnp.sum(g_l)).astype(jnp.float32)
        we = runs(robust_block(jac, g0, d1m, d2m, sel_r, sel_e))
        vc = jnp.asarray(fast.rvid)[: L * k].reshape(L, k)
        oh = (
            vc[:, :, None] == jnp.arange(n_r, dtype=jnp.int32)[None, None, :]
        ).astype(dtype)
        wb = jnp.einsum("pdlk,lkv->dlvp", we, oh, precision="highest")
        acc += jnp.sum(wb).astype(jnp.float32)
        return acc

    names = ["he_hll", "+we_b", "+we3_T", "+kernel"]
    print(f"backend={jax.default_backend()} reps={REPS}")
    prev = 0.0
    for upto, name in enumerate(names, start=1):

        def loop(upto=upto):
            def body(i, acc):
                v = jax.tree.map(
                    lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), vars0
                )
                return acc + leg(v, upto) * 1e-20 + 1e-6 * i.astype(jnp.float32)

            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

        f = jax.jit(loop)
        float(f())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        per = best / REPS * 1000
        print(f"{name:>8}: {per:7.3f} ms/call  (stage {per - prev:+7.3f} ms)")
        prev = per

    def loop_oh():
        def body(i, acc):
            v = jax.tree.map(
                lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), vars0
            )
            return acc + leg_onehot(v) * 1e-20 + 1e-6 * i.astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    f = jax.jit(loop_oh)
    float(f())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f())
        best = min(best, time.perf_counter() - t0)
    print(f"{'onehot':>8}: {best / REPS * 1000:7.3f} ms/call  (vs +we_b)")


if __name__ == "__main__":
    main()
