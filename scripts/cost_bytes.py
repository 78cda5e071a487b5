#!/usr/bin/env python
"""XLA cost_analysis (bytes accessed / flops) of the compiled direct-Schur
programs at bench scale — the fastest way to spot a traffic blow-up
(CLAUDE.md: 1.6 GB/iter was the smoking gun in round 2).

Reports three programs: the full LM ``run_loop`` (while-loop body counted
once by XLA's static analysis ⇒ read it as per-iteration), ``assemble``
alone, and one damped ``ops.solve``.  Honors the same knob env vars as the
bench (NLLSTPU_W_IMPL / SOLVE_IMPL / W_DTYPE) and matches the bench's
matmul precision default.

Usage: [NLLSTPU_PLATFORM=cpu] python scripts/cost_bytes.py [ncam] [nlmk] [vis]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
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
from nllstpu.core.optimize import compile_problem, run_loop
from nllstpu.models.ba import make_pinhole_ba, perturb_ba

NCAM = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NLMK = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
VIS = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1

KEYS = ("bytes accessed", "flops", "transcendentals")


def report(name, jitted, *args):
    try:
        comp = jitted.lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out = {k: ca.get(k) for k in KEYS if ca.get(k) is not None}
        # Per-memory-space byte counts when present (output operand etc.).
        for k, v in sorted(ca.items()):
            if k.startswith("bytes accessed") and k != "bytes accessed":
                out[k] = v
        print(f"{name}: {json.dumps(out)}", flush=True)
    except Exception as e:  # keep the queue going
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    problem, cams, lmks = make_pinhole_ba(
        NCAM, NLMK, VIS, noise=1e-3, dtype=jnp.float32, batched="cm"
    )
    perturb_ba(problem, lmks, 0.05, seed=5)
    compiled = compile_problem(
        problem, solver="schur", schur_family=nt.Euclidean(3)
    )
    ops = compiled.schur_info.ops()
    vars0 = problem.stacked_variables()
    knobs = " ".join(
        f"{k.split('_', 1)[1].lower()}={os.environ.get(k, '-')}"
        for k in ("NLLSTPU_W_IMPL", "NLLSTPU_SOLVE_IMPL", "NLLSTPU_W_DTYPE")
    )
    print(f"backend={jax.default_backend()} ncam={NCAM} nlmk={NLMK} "
          f"vis={VIS} {knobs}")

    report("assemble", jax.jit(compiled.assemble), vars0)

    _, sys0 = jax.jit(compiled.assemble)(vars0)

    def solve(sys_, lam):
        return ops.solve(sys_, lam)

    report("ops.solve", jax.jit(solve), sys0, jnp.float32(0.1))

    opts = nt.Options(
        iterator=nt.LEVENBERG_MARQUARDT, max_iters=30, rel_dcost=0.0,
        abs_dcost=0.0, dstep=1e-12, max_fails=1 << 30,
    )

    def run(v):
        return run_loop(
            compiled.assemble, compiled.cost, compiled.ctx(), opts, v
        )["bestcost"]

    report("lm_run_loop(body=1iter)", jax.jit(run), vars0)


if __name__ == "__main__":
    main()
