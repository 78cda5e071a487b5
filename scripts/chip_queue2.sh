#!/bin/sh
# Round-2 on-chip A/B queue #2: the Mosaic-ported kernels (p-major W
# placement, fused Schur reduction, both layouts) and bf16 W storage.
# All configs interleaved x3 against the onehot/xla baseline; the bench
# line's best_cost column doubles as the accuracy gate (bf16 must stay
# within ~2x of the f32 floor).  Run ONCE, chip exclusive (CLAUDE.md).
# Usage: sh scripts/chip_queue2.sh [logfile]
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/chip_queue2.log}
say() { echo "== $* ==" | tee -a "$LOG"; }

say "0. probe $(date)"
timeout 300 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }

say "1. kernel/dtype A/B (interleaved x3) $(date)"
for i in 1 2 3; do
  for cfg in "onehot xla f32" "pallas xla f32" "pallas pallas f32" \
             "onehot pallas f32" "pallas pallas bf16" "onehot xla bf16"; do
    set -- $cfg
    echo "-- round $i w=$1 solve=$2 wdt=$3" >> "$LOG"
    NLLSTPU_W_IMPL=$1 NLLSTPU_SOLVE_IMPL=$2 NLLSTPU_W_DTYPE=$3 \
      timeout 900 python bench.py --worker tpu 15 \
      2>> "$LOG" | tail -1 | sed "s/^/[w=$1 s=$2 dt=$3 r$i] /" | tee -a "$LOG"
    sleep 5
  done
done

say "done $(date)"
grep "^\[w=" "$LOG" | tail -20
