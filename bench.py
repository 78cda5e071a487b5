#!/usr/bin/env python
"""Headline benchmark: Levenberg-Marquardt iterations/sec on synthetic
SE(3)+pinhole bundle adjustment with the Schur-complement backend.

The reference publishes no numbers (BASELINE.md), so the recorded baseline is
this machine's CPU running the identical workload; ``vs_baseline`` is the
TPU/CPU speedup.  Prints ONE JSON line whose metric name includes the
platform that produced the number (a CPU fallback is never mistakable for a
TPU regression).

Workload: 128 SE(3) cameras (768 reduced dims), 8192 landmarks, ~105k
observations (10% banded visibility), float32, measurement noise 1e-3,
landmarks perturbed 0.05 — a BAL-Venice-flavored shape scaled to one chip.

Budgeting (round-1 lesson: an unbounded bench times out under the driver and
records NOTHING): the whole script honors a wall budget (``BENCH_BUDGET_S``,
default 18 min) and ALWAYS emits its JSON line before the deadline — one
TPU attempt capped at ``BENCH_TPU_TIMEOUT_S`` (default 600 s), then a CPU
fallback only if time remains.  ``vs_baseline`` uses the committed CPU
reference measurement (``scripts/cpu_ref.json``, same workload/machine) so
no CPU leg is needed in the budgeted run; it is re-measured live only when
the budget allows.  A SIGTERM handler emits the best-effort line if the
driver kills us early.

Each measurement leg runs in a subprocess with a timeout: device-to-host
readbacks through tunneled TPU transports can hang indefinitely, and a fresh
process recovers cleanly (compiles are served from the on-disk jax
compilation cache in ``.jax_cache/``, pre-warmed during the round, so the
budgeted run is cache-hot).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

NCAM = int(os.environ.get("BENCH_NCAM", 128))
NLMK = int(os.environ.get("BENCH_NLMK", 8192))
VIS = float(os.environ.get("BENCH_VIS", 0.1))
ITERS = int(os.environ.get("BENCH_ITERS", 30))
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1080))
TPU_TIMEOUT_S = float(os.environ.get("BENCH_TPU_TIMEOUT_S", 600))
_REPO = os.path.dirname(os.path.abspath(__file__))
_CPU_REF_PATH = os.path.join(_REPO, "scripts", "cpu_ref.json")
_DEADLINE = time.monotonic() + BUDGET_S

_emitted = False


def _remaining():
    return _DEADLINE - time.monotonic()


def _emit(value, platform, vs_baseline, stats=None, w_dtype="f32",
          target_cost=None):
    """Print THE one JSON line (at most once) and flush.

    Carries the accuracy half of the north-star pair (BASELINE.md:32-34):
    start/best cost and the (approximate) wall time to reach 1.1x the
    committed converged target cost — a perf "win" that degrades
    convergence is visible in the artifact, not just in worker logs.  The
    metric name embeds the effective W storage dtype so bf16 and f32 runs
    can never be silently conflated."""
    global _emitted
    if _emitted:
        return
    _emitted = True
    line = {
        "metric": (
            f"lm_iters_per_sec_pinhole_ba_{NCAM}cam_{NLMK}lmk_f32_schur"
            f"_w{w_dtype}_{platform}"
        ),
        "value": round(value, 3),
        "unit": "iter/s",
        "vs_baseline": round(vs_baseline, 3),
    }
    if stats is not None:
        line["start_cost"] = stats.get("start_cost")
        line["best_cost"] = stats.get("best_cost")
        line["iters"] = stats.get("iters")
        line["wall_s"] = stats.get("wall_s")
        line["target_cost"] = target_cost
        line["time_to_target_s"] = stats.get("time_to_target_s")
        # Secondary gated bf16-W measurement (opt-in config; the headline
        # above is the library default).
        if "bf16_iters_per_sec" in stats:
            line["bf16_iters_per_sec"] = stats["bf16_iters_per_sec"]
            line["bf16_best_cost"] = stats["bf16_best_cost"]
            line["bf16_gate_ok"] = stats["bf16_gate_ok"]
    print(json.dumps(line), flush=True)


#: bf16-W acceptance gate: the bf16 run's best cost must stay within this
#: factor of the committed f32 cost at the same iteration budget, else the
#: bench re-runs (or re-labels) in f32 — a storage-precision "win" that
#: breaks LM convergence must never become the headline number.
BF16_COST_GATE = 2.0


def bf16_cost_ok(best_cost, ref_best_cost, gate=BF16_COST_GATE):
    """True when a bf16-W run's converged cost is acceptable vs the f32
    reference at the same iteration budget (unit-tested in
    tests/test_functional.py)."""
    if ref_best_cost is None or not np.isfinite(best_cost):
        return np.isfinite(best_cost)
    return best_cost <= gate * max(ref_best_cost, 1e-12)


def worker(platform: str, iters: int, w_dtype: str = None):
    """Measure LM iterations/sec on the requested platform and print one
    JSON line with the raw stats."""
    import jax
    import jax.numpy as jnp

    if platform == "cpu":
        # The env var alone is overridden by this machine's sitecustomize
        # (see CLAUDE.md); the config update is authoritative.
        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("NLLSTPU_W_DTYPE", "f32")
    elif w_dtype is not None:
        os.environ["NLLSTPU_W_DTYPE"] = w_dtype
    else:
        # DEFAULT library config (NLLSTPU_W_DTYPE auto = f32): the
        # HEADLINE now measures exactly what a user gets out of the box
        # (VERDICT r4 weak #6 — the round-4 headline ran the opt-in bf16-W
        # config, ~8% faster on this shape but convergence-capping on
        # realistic Snavely shapes, bench_logs/r4_queue9.log; a headline
        # should not advertise a non-default trade).  main() still
        # measures the gated bf16 rate as a SECONDARY field (bf16_*) when
        # budget remains, with the bf16_cost_ok convergence gate attached.
        os.environ.setdefault("NLLSTPU_W_DTYPE", "f32")
    jax.config.update("jax_default_matmul_precision", "highest")
    cache = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    sys.path.insert(0, _REPO)

    import nllstpu as nt
    from nllstpu.core.optimize import compile_problem, run_loop
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    # Warm the device-to-host stream with a trivial readback: on tunneled
    # backends the FIRST readback can take minutes regardless of size.
    float(jnp.zeros(()))
    if platform == "cpu" and jax.default_backend() != "cpu":
        raise RuntimeError("cpu leg failed to select the cpu backend")

    problem, cams, lmks = make_pinhole_ba(
        ncameras=NCAM, nlandmarks=NLMK, prop_visible=VIS,
        noise=1e-3, dtype=jnp.float32, batched="cm",
    )
    perturb_ba(problem, lmks, 0.05, seed=5)
    compiled = compile_problem(problem, solver="schur", schur_family=nt.Euclidean(3))
    opts = nt.Options(
        iterator=nt.LEVENBERG_MARQUARDT,
        max_iters=iters,
        rel_dcost=0.0,
        abs_dcost=0.0,
        dstep=1e-12,
        max_fails=1 << 30,
        # In-loop per-iteration cost trace (a [max_iters] device array, one
        # masked write per accepted iteration — no measurable overhead):
        # main() derives time-to-target from it.
        store_trajectory=True,
    )

    def run(v):
        final = run_loop(compiled.assemble, compiled.cost, compiled.ctx(), opts, v)
        # Pack every scalar we need — including the per-iteration cost
        # trace, which main() turns into time-to-target — into ONE array so
        # the host does a single device read (multi-read robustness, see
        # module docstring).
        head = jnp.stack(
            [
                final["iternum"].astype(jnp.float32),
                final["startcost"].astype(jnp.float32),
                final["bestcost"].astype(jnp.float32),
                final["nsolve"].astype(jnp.float32),
            ]
        )
        return jnp.concatenate([head, final["trace"].astype(jnp.float32)])

    runner = jax.jit(run)
    vars0 = problem.stacked_variables()
    # On the tunneled TPU backend block_until_ready returns before execution
    # finishes; only a device readback truly synchronizes.  Every timing
    # below therefore fetches the packed result (float()) to fence.
    t0 = time.perf_counter()
    float(runner(vars0)[0])
    compile_s = time.perf_counter() - t0
    # Each timed run uses a slightly perturbed input: repeat calls with
    # bit-identical inputs have been observed to return physically
    # impossible times (runtime-level result reuse), so force real compute.
    best_rate = 0.0
    wall = float("inf")
    n_runs = 1 if platform == "cpu" else 3
    for i in range(1, n_runs + 1):
        eps = 1e-7 * i
        vars_i = jax.tree.map(lambda x: x * (1.0 + eps), vars0)
        t0 = time.perf_counter()
        out = runner(vars_i)
        run_stats = np.asarray(out, dtype=np.float64)
        run_wall = time.perf_counter() - t0
        rate = run_stats[0] / run_wall
        if rate > best_rate:
            best_rate, wall, stats = rate, run_wall, run_stats
    n_iter, start, best, solves = (
        int(stats[0]), float(stats[1]), float(stats[2]), int(stats[3]),
    )
    trace = stats[4 : 4 + n_iter].tolist()
    assert best < start, (start, best)  # sanity: LM actually descends
    print(
        json.dumps(
            {
                "platform": platform,
                "w_dtype": os.environ.get("NLLSTPU_W_DTYPE", "f32"),
                "iters_per_sec": n_iter / wall,
                "iters": n_iter,
                "wall_s": wall,
                "compile_s": compile_s,
                "start_cost": start,
                "best_cost": best,
                "solves": solves,
                "cost_trace": trace,
            }
        ),
        flush=True,
    )


def run_leg(platform: str, iters: int, timeout: float, w_dtype: str = None):
    """One subprocess measurement attempt, hard-capped at ``timeout``."""
    if timeout < 30:
        return None
    cmd = [
        sys.executable, os.path.abspath(__file__), "--worker", platform,
        str(iters),
    ]
    if w_dtype is not None:
        cmd.append(w_dtype)
    try:
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=_REPO,
        )
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        sys.stderr.write(
            f"# {platform} leg: no result (rc={proc.returncode})\n"
            f"{proc.stderr[-2000:]}\n"
        )
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"# {platform} leg: timeout after {timeout:.0f}s\n")
    return None


def load_cpu_ref():
    """Committed CPU reference (scripts/cpu_ref.json) — iters/s for
    vs_baseline plus the f32 cost targets for the bf16 gate and
    time-to-target — valid only when it was measured at the current
    workload shape AND iteration budget (round-2 weak item: a 30-iter TPU
    rate divided by a 5-iter CPU rate mixes fixed-cost amortization)."""
    try:
        with open(_CPU_REF_PATH) as f:
            ref = json.load(f)
        if (
            ref.get("ncam") == NCAM
            and ref.get("nlmk") == NLMK
            and ref.get("vis") == VIS
            and ref.get("iters") == ITERS
            and ref.get("iters_per_sec", 0) > 0
        ):
            return ref
    except (OSError, ValueError):
        pass
    return None


def time_to_target(stats, target_cost):
    """Approximate wall seconds for the measured run to reach
    ``1.1 x target_cost``: per-iteration costs come from the jitted loop's
    trace; wall per iteration is uniform (the loop body is one fused
    program — finer attribution isn't observable from outside it).  None
    when the run never reaches the target."""
    if not stats or target_cost is None:
        return None
    trace = stats.get("cost_trace") or []
    n = stats.get("iters", len(trace))
    wall = stats.get("wall_s")
    if not trace or not n or wall is None:
        return None
    for i, c in enumerate(trace):
        if c <= 1.1 * target_cost:
            return wall * (i + 1) / n
    return None


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(
            sys.argv[2],
            int(sys.argv[3]),
            sys.argv[4] if len(sys.argv) > 4 else None,
        )
        return

    # Best-effort line even if the driver SIGTERMs us before the deadline.
    def _on_term(signum, frame):
        _emit(0.0, "none", 0.0)
        sys.exit(1)

    signal.signal(signal.SIGTERM, _on_term)

    has_tpu = os.environ.get("JAX_PLATFORMS", "").replace("cpu", "").strip(", ") != ""
    cpu_ref = load_cpu_ref()
    ref_rate = cpu_ref["iters_per_sec"] if cpu_ref else None
    ref_best = cpu_ref.get("best_cost") if cpu_ref else None
    target_cost = cpu_ref.get("target_cost") if cpu_ref else None

    main_stats = None
    platform = "cpu"
    if has_tpu:
        # ONE TPU attempt: killing a wedged TPU worker leaves the remote
        # lease wedged for the next process too, so a single patient attempt
        # beats retries — and the budget must leave room for the CPU
        # fallback + the final print.  The headline leg runs the LIBRARY
        # DEFAULT config (f32 W storage — see worker()); the opt-in bf16-W
        # rate is attached as a secondary gated measurement below.
        tpu_timeout = min(TPU_TIMEOUT_S, _remaining() - 60)
        main_stats = run_leg("tpu", ITERS, timeout=tpu_timeout)
        if main_stats is not None:
            platform = "tpu"
            if _remaining() > 240:
                bf16_stats = run_leg(
                    "tpu", ITERS,
                    timeout=min(TPU_TIMEOUT_S, _remaining() - 60),
                    w_dtype="bf16",
                )
                if bf16_stats is not None:
                    ok = bf16_cost_ok(
                        bf16_stats["best_cost"],
                        ref_best
                        if ref_best is not None
                        else main_stats["best_cost"],
                    )
                    main_stats["bf16_iters_per_sec"] = bf16_stats[
                        "iters_per_sec"
                    ]
                    main_stats["bf16_best_cost"] = bf16_stats["best_cost"]
                    main_stats["bf16_gate_ok"] = bool(ok)
    if main_stats is None:
        # CPU fallback (or CPU-only machine): fewer iters, remaining budget.
        main_stats = run_leg("cpu", min(ITERS, 5), timeout=_remaining() - 20)
    if main_stats is None:
        _emit(0.0, "none", 0.0)
        return

    value = main_stats["iters_per_sec"]
    if ref_rate:
        vs_baseline = value / ref_rate
    elif platform == "cpu":
        vs_baseline = 1.0
    else:
        # No committed reference: measure CPU live only if budget remains.
        cpu_stats = run_leg("cpu", min(ITERS, 5), timeout=_remaining() - 20)
        vs_baseline = (
            value / cpu_stats["iters_per_sec"]
            if cpu_stats and cpu_stats["iters_per_sec"] > 0
            else 1.0
        )
    main_stats["time_to_target_s"] = time_to_target(main_stats, target_cost)
    _emit(
        value,
        platform,
        vs_baseline,
        stats=main_stats,
        w_dtype=main_stats.get("w_dtype", "f32"),
        target_cost=target_cost,
    )


if __name__ == "__main__":
    main()
