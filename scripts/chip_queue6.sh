#!/bin/sh
# Round-3 on-chip queue #4: gather split, entry-shape kernel compile check,
# committed round-over-round A/B (HEAD vs the round-2 snapshot).
# Usage: sh scripts/chip_queue6.sh [logdir] [roundref]
set -u
cd "$(dirname "$0")/.." || exit 1
LOGDIR=${1:-bench_logs}
REF=${2:-53e22a8}
mkdir -p "$LOGDIR"
LOG="$LOGDIR/r3_queue4.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest

say() { echo "== $* ==" | tee -a "$LOG"; }

say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }

say "1. cost gather split (per-slot + broadcast-runs) $(date)"
timeout 1200 python scripts/profile_cost.py >> "$LOG" 2>&1

say "2. driver-entry compile check on chip (flagship tiny shape) $(date)"
timeout 900 python -c "
import __graft_entry__ as g
import jax
fn, args = g.entry()
out = jax.jit(fn)(*args)
print('entry ok:', [float(jax.numpy.ravel(o)[0]) for o in jax.tree.leaves(out)][:2])
" >> "$LOG" 2>&1

say "3. round-over-round A/B: HEAD vs $REF (30it x3) $(date)"
timeout 5400 python scripts/ab_bench.py --ref "$REF" --rounds 3 --iters 30 \
  >> "$LOG" 2>&1

say "done $(date)"
