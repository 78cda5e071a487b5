#!/bin/sh
# Round-3 on-chip queue #3: post-fused_all bottleneck hunt.
#   1. cost-pass micro-profile (gather-bound vs compute-bound?)
#   2. solve phase A/B: XLA vs the HIGH-precision pallas reduction
#      (fused_all pm layout, bf16 W) — phase level then end-to-end
#   3. full bench.py main (new default headline + accuracy gate)
# Usage: sh scripts/chip_queue5.sh [logdir]
set -u
cd "$(dirname "$0")/.." || exit 1
LOGDIR=${1:-bench_logs}
mkdir -p "$LOGDIR"
LOG="$LOGDIR/r3_queue3.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest

say() { echo "== $* ==" | tee -a "$LOG"; }

say "probe $(date)"
timeout 300 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }

say "1. cost micro-profile $(date)"
timeout 1200 python scripts/profile_cost.py >> "$LOG" 2>&1

say "2a. phases fused_all/xla/bf16 $(date)"
NLLSTPU_W_DTYPE=bf16 timeout 1200 \
  python scripts/profile_solve_phases.py >> "$LOG" 2>&1

say "2b. phases fused_all/PALLAS-solve(HIGH)/bf16 $(date)"
NLLSTPU_SOLVE_IMPL=pallas NLLSTPU_W_DTYPE=bf16 timeout 1200 \
  python scripts/profile_solve_phases.py >> "$LOG" 2>&1

say "2c. end-to-end A/B solve xla vs pallas (30it, x2 interleaved) $(date)"
for i in 1 2; do
  for s in xla pallas; do
    echo "-- round $i solve=$s" >> "$LOG"
    NLLSTPU_SOLVE_IMPL=$s timeout 900 python bench.py --worker tpu 30 \
      2>> "$LOG" | tail -1 | sed "s/^/[solve=$s r$i] /" | tee -a "$LOG"
    sleep 3
  done
done

say "3. full bench.py main (headline + gate) $(date)"
timeout 1100 python bench.py 2>> "$LOG" | tee -a "$LOG"

say "done $(date)"
