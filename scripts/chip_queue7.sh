#!/bin/sh
# Round-3 on-chip queue #5: fused_trial A/B, final headline, giant stepped
# refresh at the round's final HEAD.
# Usage: sh scripts/chip_queue7.sh [logdir]
set -u
cd "$(dirname "$0")/.." || exit 1
LOGDIR=${1:-bench_logs}
mkdir -p "$LOGDIR"
LOG="$LOGDIR/r3_queue5.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest

say() { echo "== $* ==" | tee -a "$LOG"; }

say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }

say "1. fused_trial A/B (auto=on vs off, 30it, x2 interleaved) $(date)"
for i in 1 2; do
  for ft in on off; do
    echo "-- round $i fused_trial=$ft" >> "$LOG"
    if [ "$ft" = off ]; then export NLLSTPU_FUSED_TRIAL=0; else unset NLLSTPU_FUSED_TRIAL; fi
    timeout 900 python bench.py --worker tpu 30 \
      2>> "$LOG" | tail -1 | sed "s/^/[ft=$ft r$i] /" | tee -a "$LOG"
    sleep 3
  done
done
unset NLLSTPU_FUSED_TRIAL

say "2. full bench.py main (final headline + gate) $(date)"
timeout 1100 python bench.py 2>> "$LOG" | tee -a "$LOG"

say "3. giant stepped 838k refresh (implicit, 5 iters) $(date)"
timeout 1800 python scripts/giant_implicit.py stepped >> "$LOG" 2>&1 \
  || say "3. giant stepped FAILED (rc=$?)"

say "done $(date)"
