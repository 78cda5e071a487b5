#!/bin/sh
# Round-4 on-chip queue #16: formal interleaved A/B for the damped-kernel
# solve default flip (HEAD auto=pallas vs a09c5e1 xla default), headline
# bf16-W config, 30 iters x 3 rounds.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG="bench_logs/r4_queue16.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "ab_bench HEAD vs a09c5e1 (solve default flip), 30 iters, 3 rounds $(date)"
timeout 5400 python scripts/ab_bench.py --ref a09c5e1 --rounds 3 --iters 30 \
  >> "$LOG" 2>&1
say "done $(date)"
