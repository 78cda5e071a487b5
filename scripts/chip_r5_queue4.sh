#!/bin/sh
# Round-5 on-chip queue #4: the TRUE fused path at realistic shapes (the
# nres qualification fix re-engages w_pm — r5_queue3 measured the one-hot
# fallback everywhere), wide damped solve in driver context, and the
# uniform-headline A/B guard vs the round-4 end commit.
set -u
cd "${1:-$(dirname "$0")/..}" || exit 1
LOG="/root/repo/bench_logs/r5_queue4.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date) tree=$(pwd) sha=$(git rev-parse --short HEAD)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. profile_realistic bench (fused cap-64 + wide damped solve) $(date)"
timeout 1800 python scripts/profile_realistic.py bench 50 >> "$LOG" 2>&1
sleep 30
say "2. bal_realistic bench direct 30 (queue-18 bar: >=86.6 it/s) $(date)"
timeout 1500 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "3. bal_realistic ladybug direct 60 $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug direct 60 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "4. uniform headline A/B guard: HEAD vs 65cb84f (r4 end) $(date)"
timeout 3600 python scripts/ab_bench.py --ref 65cb84f --rounds 2 \
  --iters 30 >> "$LOG" 2>&1
say "done $(date)"
