#!/bin/sh
# Round-5 on-chip queue #8: committed end-to-end implicit numbers after
# the one-hot v-expansion (profiler end-to-end: 66 it/s at Ladybug, was
# 16-19; per-CG-iteration 3.1 -> 0.12 ms).
set -u
cd "${1:-$(dirname "$0")/..}" || exit 1
LOG="/root/repo/bench_logs/r5_queue8.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date) tree=$(pwd) sha=$(git rev-parse --short HEAD)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. bal_realistic ladybug implicit 60 $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug implicit 60 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "2. bal_realistic bench implicit 30 $(date)"
timeout 1500 python scripts/bal_realistic.py bench implicit 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
say "done $(date)"
