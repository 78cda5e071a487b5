#!/bin/sh
# Round-4 on-chip queue #12: diagnose the bench-realistic 5-iter stop.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG="bench_logs/r4_queue13.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. bench realistic direct fused (NaN-guard recovery) $(date)"
timeout 1500 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "2. ladybug direct (NaN-guard trajectory check, 60 iters) $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug direct 60 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "3. bench realistic implicit (floor datum at fused cost path) $(date)"
timeout 1500 python scripts/bal_realistic.py bench implicit 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
say "done $(date)"
