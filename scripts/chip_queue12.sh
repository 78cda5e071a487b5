#!/bin/sh
# Round-4 on-chip queue #12: diagnose the bench-realistic 5-iter stop.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG="bench_logs/r4_queue12.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. bench realistic direct fused (termination diagnosis) $(date)"
timeout 1500 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "2. bench realistic direct ONE-HOT (kernel-vs-solve isolation) $(date)"
NLLSTPU_W_IMPL=onehot timeout 1500 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | sed 's/^/[onehot] /' | tee -a "$LOG"
say "done $(date)"
