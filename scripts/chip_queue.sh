#!/bin/sh
# Round-2 on-chip validation queue (docs/ROOFLINE.md EXPERIMENTS).
# Run ONCE when the TPU tunnel answers; strictly sequential — the chip is
# exclusive per process and a straggler wedges the next job (CLAUDE.md).
# Usage: sh scripts/chip_queue.sh [logfile]
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/chip_queue.log}
say() { echo "== $* ==" | tee -a "$LOG"; }

say "0. probe $(date)"
timeout 300 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }

say "1. bench TPU leg (prewarm + measure) $(date)"
timeout 1500 python bench.py --worker tpu 15 >> "$LOG" 2>&1

say "2. kernel env A/B (interleaved x3) $(date)"
for i in 1 2 3; do
  for cfg in "onehot xla" "pallas xla" "fused xla" "onehot pallas" "fused pallas"; do
    set -- $cfg
    echo "-- round $i w=$1 solve=$2" >> "$LOG"
    NLLSTPU_W_IMPL=$1 NLLSTPU_SOLVE_IMPL=$2 timeout 900 python bench.py --worker tpu 15 \
      2>> "$LOG" | tail -1 | sed "s/^/[w=$1 s=$2 r$i] /" | tee -a "$LOG"
    sleep 10
  done
done

say "3. A/B vs round-1 end (c8a5db4) $(date)"
timeout 3600 python scripts/ab_bench.py --ref c8a5db4 --rounds 2 >> "$LOG" 2>&1

say "4. giant 838k fulljit with chunked CG $(date)"
GIANT_ITERS=3 timeout 1800 python scripts/giant_implicit.py fulljit >> "$LOG" 2>&1

say "done $(date)"
tail -40 "$LOG"
