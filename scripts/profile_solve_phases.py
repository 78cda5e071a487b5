#!/usr/bin/env python
"""Per-phase breakdown of the direct-Schur damped solve at bench scale.

Times cumulative stage prefixes of ``SchurOps.solve`` (h_inv; +y; +S;
+cholesky; +backsub = full) inside one jitted ``fori_loop`` of REPS
iterations, so per-call dispatch (~30ms on the tunneled TPU) amortizes
away.  Stage costs are adjacent differences.  λ varies per rep (traced
carry) so XLA cannot hoist the computation out of the loop, and timing is
readback-fenced (see CLAUDE.md: ``block_until_ready`` does not fence).

Usage: python scripts/profile_solve_phases.py [ncam] [nlmk] [vis] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# Profiles the default (TPU) backend; NLLSTPU_PLATFORM=cpu for smoke tests
# (the env var alone is overridden by sitecustomize, see CLAUDE.md).
if os.environ.get("NLLSTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NLLSTPU_PLATFORM"])

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import nllstpu as nt
from nllstpu.core.linearsolver import batched_inv_spd_cm, cholesky_solve
from nllstpu.core.optimize import compile_problem
from nllstpu.models.ba import make_pinhole_ba, perturb_ba

NCAM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NLMK = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
VIS = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 50


def main():
    float(jnp.zeros(()))  # warm the D2H stream
    problem, cams, lmks = make_pinhole_ba(
        NCAM, NLMK, VIS, noise=1e-3, dtype=jnp.float32, batched="cm"
    )
    perturb_ba(problem, lmks, 0.05, seed=5)
    compiled = compile_problem(
        problem, solver="schur", schur_family=nt.Euclidean(3)
    )
    ops = compiled.schur_info.ops()
    vars0 = problem.stacked_variables()
    _, sys0 = jax.jit(compiled.assemble)(vars0)
    dr = ops.dim_reduced

    def stages(sys, lam, upto):
        """Cumulative stage prefixes of SchurOps._solve — both the
        standard [dl, L, Dr] layout and the p-major [dl, wc, L] one
        (ops.pm set), mirroring the production einsums exactly."""
        a_rr, b_r, h_ll, g_l, w = sys
        dl = ops.dof_elim
        pm = ops.pm is not None
        acc = jnp.zeros((), jnp.float32)
        h_inv = batched_inv_spd_cm(
            h_ll + lam * jnp.eye(dl, dtype=h_ll.dtype)[:, :, None]
        )
        acc += jnp.sum(h_inv).astype(jnp.float32)
        if upto >= 2:
            y = (
                jnp.einsum("drl,del->erl", w, h_inv)
                if pm
                else jnp.einsum("dlr,del->elr", w, h_inv)
            )
            acc += jnp.sum(y).astype(jnp.float32)
        if upto >= 3:
            prec = "highest" if a_rr.dtype == jnp.float64 else "high"
            s_sum = (
                jnp.einsum("erl,esl->rs", y, w, precision=prec)
                if pm
                else jnp.einsum("elr,els->rs", y, w, precision=prec)
            )
            acc += jnp.sum(s_sum).astype(jnp.float32)
        if upto >= 4:
            rhs_sum = (
                jnp.einsum("erl,el->r", y, g_l)
                if pm
                else jnp.einsum("elr,el->r", y, g_l)
            )
            s_sum, rhs_sum = ops._from_w_basis(s_sum, rhs_sum)
            s = a_rr + lam * jnp.eye(dr, dtype=a_rr.dtype) - s_sum
            xr = cholesky_solve(s, b_r - rhs_sum)
            acc += jnp.sum(xr).astype(jnp.float32)
        if upto >= 5:
            xr_w = ops._to_w_basis(xr, w.shape[1] if pm else w.shape[-1])
            wx = (
                jnp.einsum("drl,r->dl", w, xr_w)
                if pm
                else jnp.einsum("dlr,r->dl", w, xr_w)
            )
            xl = jnp.einsum("del,el->dl", h_inv, g_l - wx)
            acc += jnp.sum(xl).astype(jnp.float32)
        return acc

    names = ["h_inv", "+y=W·Hinv", "+S", "+chol(S)", "+backsub(full)"]

    def make_loop(upto):
        def body(i, acc):
            lam = 0.1 * (1.0 + 1e-5 * i.astype(jnp.float32)) + 1e-9 * acc
            return stages(sys0, lam, upto) * 1e-20 + acc

        return jax.jit(lambda: jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32)))

    # Also profile assemble and cost in-loop for context.
    def assemble_loop():
        def body(i, acc):
            v = jax.tree.map(
                lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), vars0
            )
            c, s = compiled.assemble(v)
            # Consume EVERY output: an unused Hessian gets DCE'd and the
            # "assemble" time silently measures only the cost eval
            # (CLAUDE.md: this hid 13ms of assembly for a whole round).
            used = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(s))
            return acc + (c.astype(jnp.float32) + used) * 1e-20 + 1e-6 * i.astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    def ops_solve_loop():
        """The REAL damped solve as configured (NLLSTPU_SOLVE_IMPL &
        friends), not the XLA stage decomposition above."""
        def body(i, acc):
            lam = 0.1 * (1.0 + 1e-5 * i.astype(jnp.float32)) + 1e-9 * acc
            x = ops.solve(sys0, lam.astype(sys0[0].dtype))
            return acc + jnp.sum(x).astype(jnp.float32) * 1e-20 + 1e-6 * i.astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    def cost_loop():
        def body(i, acc):
            v = jax.tree.map(
                lambda x: x * (1 + 1e-9 * acc.astype(x.dtype)), vars0
            )
            return acc + compiled.cost(v).astype(jnp.float32) * 1e-20 + 1e-6 * i.astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    knobs = " ".join(
        f"{k.split('_', 1)[1].lower()}={os.environ.get(k, '-')}"
        for k in ("NLLSTPU_W_IMPL", "NLLSTPU_SOLVE_IMPL", "NLLSTPU_W_DTYPE")
    )
    print(
        f"backend={jax.default_backend()} ncam={NCAM} nlmk={NLMK} vis={VIS}"
        f" reps={REPS} {knobs}"
    )
    prev = 0.0
    stage_list = names
    for upto, name in enumerate(stage_list, start=1):
        f = make_loop(upto)
        float(f())  # compile + fence
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        per = best / REPS * 1000
        print(f"{name:>16}: {per:7.3f} ms/call  (stage {per - prev:+7.3f} ms)")
        prev = per

    for name, fn in (
        ("ops.solve", ops_solve_loop),
        ("assemble", assemble_loop),
        ("cost", cost_loop),
    ):
        f = jax.jit(fn)
        float(f())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        print(f"{name:>16}: {best / REPS * 1000:7.3f} ms/call")


if __name__ == "__main__":
    main()
