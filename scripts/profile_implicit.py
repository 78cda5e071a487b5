#!/usr/bin/env python
"""Phase profile of the IMPLICIT (schur_cg) backend at realistic shapes
(VERDICT r5 item 5: implicit is ~10x slower than direct there and its CG
cost was never phase-profiled).

Times, each as a REPS-deep jitted fori loop with all outputs consumed
(standalone sub-op timings lie at ~30 ms/dispatch — CLAUDE.md):
  matvec      one S·v application (W u expand + WT v reduce + h_inv + A_rr)
  precond     Schur-Jacobi preconditioner block build + inversion
  solve_k     one damped solve at cg_fixed_iters=K (K swept)
  assemble    the implicit system assembly
  cost        the cost pass
plus an end-to-end iters/s at the default tolerance for context.

Usage: python scripts/profile_implicit.py [ladybug|bench] [reps]
"""
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

import nllstpu as nt  # noqa: E402
from nllstpu.core.optimize import compile_problem, run_loop  # noqa: E402
from nllstpu.models import bal  # noqa: E402
from nllstpu.models.ba import perturb_ba  # noqa: E402

SHAPE = sys.argv[1] if len(sys.argv) > 1 else "ladybug"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30


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
    compiled = compile_problem(
        problem, solver="schur_cg", schur_family=bal.PT
    )
    info = compiled.schur_info
    vars0 = problem.stacked_variables()
    _, sys0 = jax.jit(compiled.assemble)(vars0)
    wpb = info.wpart_buckets if hasattr(info, "wpart_buckets") else ()
    print(
        f"backend={jax.default_backend()} shape={SHAPE} reps={REPS}"
        f" nobs={len(data['pt_idx'])}"
        f" wpart_buckets={'y' if any(b is not None for b in wpb) else 'n'}"
        f" dim_reduced={info.dim_reduced} L={info.num_elim}",
        flush=True,
    )

    def timed(name, fn, reps_scale=1.0):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        float(f())
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name:>12}: {best / (REPS * reps_scale) * 1e3:8.3f} ms/call"
            f"  (compile {compile_s:.1f}s)",
            flush=True,
        )

    from nllstpu.core.linearsolver import batched_inv_spd_cm

    def mk_ops(**kw):
        return compiled.ctx(nt.Options(
            solver="schur_cg", schur_family=bal.PT, **kw
        )).ops()

    ops = mk_ops()
    a_rr, b_r, h_ll, g_l, wparts = sys0
    dl = info.dof_elim
    h_inv0 = batched_inv_spd_cm(
        h_ll + 0.1 * jnp.eye(dl, dtype=h_ll.dtype)[:, :, None]
    )

    def matvec_loop():
        v0 = b_r

        def body(i, v):
            v = v * (1.0 + 1e-9 * i.astype(v.dtype))
            u = ops._wt_apply(wparts, v)
            hu = jnp.einsum("del,el->dl", h_inv0, u)
            y = ops._w_apply(wparts, hu)
            return a_rr @ v - y

        return jnp.sum(jax.lax.fori_loop(0, REPS, body, v0))

    def precond_loop():
        def body(i, acc):
            lam = 0.1 * (1.0 + 1e-6 * i.astype(jnp.float32))
            blocks, _ = ops.precond_blocks(
                sys0, lam.astype(a_rr.dtype), h_inv0
            )
            return acc + sum(jnp.sum(b) for b in blocks) * 1e-20

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), a_rr.dtype))

    def solve_loop(k):
        ops_k = mk_ops(cg_fixed_iters=k)

        def body(i, acc):
            lam = 0.1 * (1.0 + 1e-5 * i.astype(jnp.float32)) + 1e-9 * acc
            x = ops_k.solve(sys0, lam.astype(a_rr.dtype))
            return acc + jnp.sum(x).astype(jnp.float32) * 1e-20

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
            return acc + (c.astype(jnp.float32) + used) * 1e-20

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    def cost_loop():
        def body(i, acc):
            v = jax.tree.map(
                lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), vars0
            )
            return acc + compiled.cost(v).astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    timed("matvec", matvec_loop)
    timed("precond", precond_loop)
    for k in (5, 25):
        timed(f"solve_cg{k}", lambda k=k: solve_loop(k))
    timed("assemble", assemble_loop)
    timed("cost", cost_loop)

    # End-to-end context (default tolerance).
    opts = nt.Options(
        solver="schur_cg", schur_family=bal.PT,
        iterator=nt.LEVENBERG_MARQUARDT, max_iters=REPS,
        rel_dcost=0.0, abs_dcost=0.0, dstep=1e-12, max_fails=1 << 30,
        linear_tol=1e-2,
    )

    def run(v):
        final = run_loop(
            compiled.assemble, compiled.cost, compiled.ctx(opts), opts, v
        )
        return jnp.stack([
            final["iternum"].astype(jnp.float32),
            final["bestcost"].astype(jnp.float32),
        ])

    runner = jax.jit(run)
    t0 = time.perf_counter()
    float(runner(vars0)[0])
    compile_s = time.perf_counter() - t0
    best_rate = 0.0
    for i in range(1, 4):
        vi = jax.tree.map(lambda x: x * (1.0 + 1e-7 * i), vars0)
        t0 = time.perf_counter()
        out = np.asarray(runner(vi), dtype=np.float64)
        wall = time.perf_counter() - t0
        best_rate = max(best_rate, out[0] / wall)
    print(
        f"end-to-end: {best_rate:.1f} LM it/s (compile {compile_s:.1f}s, "
        f"best_cost {out[1]:.4g})",
        flush=True,
    )


if __name__ == "__main__":
    main()
