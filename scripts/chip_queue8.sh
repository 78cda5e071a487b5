#!/bin/sh
# Round-4 on-chip queue #8: realistic-BAL end-to-end (VERDICT item 1),
# W-dtype default A/B (item 4 lever 1), fresh headline.
# Usage: sh scripts/chip_queue8.sh [logdir]
set -u
cd "$(dirname "$0")/.." || exit 1
LOGDIR=${1:-bench_logs}
mkdir -p "$LOGDIR"
LOG="$LOGDIR/r4_queue8.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest

say() { echo "== $* ==" | tee -a "$LOG"; }

say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }

say "1. realistic BAL ladybug (49cam/7776pt/~35k obs) direct $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
say "1b. realistic BAL ladybug implicit $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug implicit 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"

say "2. realistic BAL bench-scale (128cam/8192pt/~100k obs) direct $(date)"
timeout 1800 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
say "2b. realistic BAL bench-scale implicit $(date)"
timeout 1500 python scripts/bal_realistic.py bench implicit 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"

say "3. W-dtype A/B on the uniform headline shape (3 interleaved rounds) $(date)"
for i in 1 2 3; do
  for wd in bf16 f32; do
    echo "-- round $i w_dtype=$wd" >> "$LOG"
    timeout 900 python bench.py --worker tpu 30 "$wd" \
      2>> "$LOG" | tail -1 | sed "s/^/[w=$wd r$i] /" | tee -a "$LOG"
    sleep 3
  done
done

say "4. full bench.py main (headline + gate) $(date)"
timeout 1200 python bench.py 2>> "$LOG" | tee -a "$LOG"

say "done $(date)"
