#!/bin/sh
# Round-4 on-chip queue #18: whole-bucket aliased-accumulate assembly —
# compile + phase timing + end-to-end convergence on realistic shapes.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG="bench_logs/r4_queue18.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. profile_realistic bench (aliased whole-bucket assembly) $(date)"
timeout 1800 python scripts/profile_realistic.py bench 50 >> "$LOG" 2>&1
sleep 30
say "2. profile_realistic ladybug $(date)"
timeout 1800 python scripts/profile_realistic.py ladybug 50 >> "$LOG" 2>&1
sleep 30
say "3. bal_realistic bench direct 30 (end-to-end + convergence parity) $(date)"
timeout 1500 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "4. bal_realistic ladybug direct 60 $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug direct 60 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
say "done $(date)"
