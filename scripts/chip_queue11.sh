#!/bin/sh
# Round-4 on-chip queue #10: realistic-shape legs with chunked fused_all
# kernels + the f32-W default (queue 9's compile failures fixed).
# Usage: sh scripts/chip_queue11.sh [logdir]
set -u
cd "$(dirname "$0")/.." || exit 1
LOGDIR=${1:-bench_logs}
mkdir -p "$LOGDIR"
LOG="$LOGDIR/r4_queue11.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest

say() { echo "== $* ==" | tee -a "$LOG"; }

say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }

say "2. bench-scale realistic direct f32 default (fused path, 30 iters) $(date)"
timeout 1800 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30

say "done $(date)"
