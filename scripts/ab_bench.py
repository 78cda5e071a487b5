#!/usr/bin/env python
"""A/B benchmark: this checkout vs a git ref (default HEAD~1), interleaved.

Chip state drifts run to run (CLAUDE.md: the same commit measured 47.7 and
52.3 it/s on different days), so perf claims REQUIRE an interleaved A/B
against the parent commit in one session — this script automates that
discipline.

    python scripts/ab_bench.py [--ref HEAD~1] [--rounds 3] [--platform tpu]

Each leg runs ``bench.py --worker <platform> <iters>`` as a subprocess (the
persistent compile cache makes repeats cheap; inputs are perturbed inside
the worker so timings are real).  Legs alternate A,B,A,B,... and the report
prints per-leg rates, medians, and the B/A ratio.  TPU is held exclusively
per process — never run this concurrently with another TPU job.
"""

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(tree: str, platform: str, iters: int, timeout: int):
    proc = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py"), "--worker", platform, str(iters)],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=tree,
    )
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)["iters_per_sec"]
    sys.stderr.write(f"# leg in {tree} failed (rc={proc.returncode}):\n{proc.stderr[-1500:]}\n")
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="HEAD~1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--platform", default="tpu")
    ap.add_argument("--iters", type=int, default=int(os.environ.get("BENCH_ITERS", 15)))
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    sha = subprocess.run(
        ["git", "rev-parse", "--short", args.ref], capture_output=True, text=True,
        cwd=REPO, check=True,
    ).stdout.strip()
    wt = f"/tmp/nllstpu_ab_{sha}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.ref],
            cwd=REPO, check=True,
        )
    # Share the compile cache so both sides run cache-hot.  lexists +
    # unlink: a reused ref worktree can hold a DANGLING symlink from an
    # earlier A/B whose driving worktree was removed (os.path.exists
    # follows the link and then symlink() raises FileExistsError —
    # r5_queue5.log leg 6).
    cache_link = os.path.join(wt, ".jax_cache")
    if os.path.islink(cache_link):
        os.unlink(cache_link)
    if not os.path.lexists(cache_link):
        os.symlink(os.path.join(REPO, ".jax_cache"), cache_link)

    # Every A/B leaves a committed artifact (bench_logs/) so perf claims in
    # commit messages stay reproducible after /tmp logs rotate.
    head_sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
        text=True, cwd=REPO, check=True,
    ).stdout.strip()
    log_dir = os.path.join(REPO, "bench_logs")
    os.makedirs(log_dir, exist_ok=True)
    log_path = os.path.join(log_dir, f"ab_{head_sha}_vs_{sha}.json")

    a_rates, b_rates = [], []
    for i in range(args.rounds):
        for tree, rates, name in ((REPO, a_rates, "A=HEAD"), (wt, b_rates, f"B={sha}")):
            r = run_leg(tree, args.platform, args.iters, args.timeout)
            print(f"round {i} {name}: {r if r is None else round(r, 2)} it/s", flush=True)
            if r is not None:
                rates.append(r)
    if a_rates and b_rates:
        ma, mb = statistics.median(a_rates), statistics.median(b_rates)
        result = {
            "head": head_sha,
            "head_median": round(ma, 3),
            "ref": sha,
            "ref_median": round(mb, 3),
            "head_over_ref": round(ma / mb, 4),
            "head_runs": [round(r, 2) for r in a_rates],
            "ref_runs": [round(r, 2) for r in b_rates],
            "platform": args.platform,
            "iters": args.iters,
        }
        print(json.dumps(result))
        with open(log_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"# written to {log_path}", file=sys.stderr)
    else:
        print(json.dumps({"error": "one side produced no measurement"}))
        sys.exit(1)


if __name__ == "__main__":
    main()
