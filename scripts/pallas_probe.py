#!/usr/bin/env python
"""On-chip Pallas kernel probe: compile + run each kernel at tiny shapes,
print pass/fail + max error.  Usage: python scripts/pallas_probe.py
[reduce|reduce_lm|place|all]

The remote Mosaic compiler rejects ops the interpreter accepts (>2D
gathers, lane/sublane-remixing reshapes, dynamic lane slices, i64
index-map constants under x64, ...); this is the fast iteration loop for
kernel ports — run it whenever a kernel changes, BEFORE queueing a full
bench A/B.  Keep shapes small: compile time dominates."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def _report(name, fn):
    try:
        t0 = time.perf_counter()
        err = fn()
        print(f"{name}: OK ({time.perf_counter()-t0:.1f}s) maxrelerr={err:.2e}",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:4000]}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    print("backend:", jax.default_backend(), flush=True)
    float(jnp.zeros(()))  # warm the D2H stream

    rng = np.random.default_rng(0)

    if which in ("reduce", "all"):
        from nllstpu.ops.pallas.schur_reduce import reduce_s

        def run():
            dl, L, dr = 3, 512, 30
            w = jnp.asarray(rng.standard_normal((dl, L, dr)), jnp.float32)
            a = rng.standard_normal((dl, dl, L)).astype(np.float32)
            hi = jnp.asarray(np.einsum("del,fel->dfl", a, a))
            g = jnp.asarray(rng.standard_normal((dl, L)), jnp.float32)
            s, r = jax.jit(lambda *x: reduce_s(*x))(w, hi, g)
            y = np.einsum("dlr,del->elr", np.asarray(w), np.asarray(hi))
            s_ref = np.einsum("elr,els->rs", y, np.asarray(w))
            r_ref = np.einsum("elr,el->r", y, np.asarray(g))
            return max(
                (np.abs(np.asarray(s) - s_ref) / (1 + np.abs(s_ref))).max(),
                (np.abs(np.asarray(r) - r_ref) / (1 + np.abs(r_ref))).max(),
            )

        _report("reduce_s", run)

    if which in ("reduce_lm", "all"):
        from nllstpu.ops.pallas.schur_reduce import reduce_s_lm

        def run():
            dl, L, wc = 3, 512, 30
            w = jnp.asarray(rng.standard_normal((dl, wc, L)), jnp.float32)
            a = rng.standard_normal((dl, dl, L)).astype(np.float32)
            hi = jnp.asarray(np.einsum("del,fel->dfl", a, a))
            g = jnp.asarray(rng.standard_normal((dl, L)), jnp.float32)
            s, r = jax.jit(lambda *x: reduce_s_lm(*x))(w, hi, g)
            y = np.einsum("drl,del->erl", np.asarray(w), np.asarray(hi))
            s_ref = np.einsum("erl,esl->rs", y, np.asarray(w))
            r_ref = np.einsum("erl,el->r", y, np.asarray(g))
            return max(
                (np.abs(np.asarray(s) - s_ref) / (1 + np.abs(s_ref))).max(),
                (np.abs(np.asarray(r) - r_ref) / (1 + np.abs(r_ref))).max(),
            )

        _report("reduce_s_lm", run)

    if which in ("place", "all"):
        from nllstpu.ops.pallas.w_place import place_w_pm

        def run():
            n_r, dr_s, dl, k_len, L = 5, 6, 3, 4, 512
            nrp = 128
            we3 = jnp.asarray(
                rng.standard_normal((k_len, dl * dr_s, L)), jnp.float32
            )
            vc2 = jnp.asarray(rng.integers(0, n_r + 2, (k_len, L)), jnp.int32)
            out = jax.jit(
                lambda a, b: place_w_pm(a, b, n_r, dr_s, dl)
            )(we3, vc2)
            out_np = np.asarray(out)
            expect = np.zeros((dl, dr_s * nrp, L), np.float32)
            vc_np, we_np = np.asarray(vc2), np.asarray(we3)
            for l in range(L):
                for k in range(k_len):
                    v = vc_np[k, l]
                    if v >= n_r:
                        continue
                    for d in range(dl):
                        for p in range(dr_s):
                            expect[d, p * nrp + v, l] += we_np[k, d * dr_s + p, l]
            return (np.abs(out_np - expect) / (1 + np.abs(expect))).max()

        _report("place_w_pm", run)


if __name__ == "__main__":
    main()
