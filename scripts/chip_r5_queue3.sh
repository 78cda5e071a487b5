#!/bin/sh
# Round-5 on-chip queue #3: the probe-refitted gate (5-W-block into
# staging, no 256 tile for accumulate calls) — realistic-shape end-to-end
# at HEAD (the queue-18 bar), wide damped solve in the driver, uniform
# headline guard, and the first implicit phase profile.
set -u
cd "${1:-$(dirname "$0")/..}" || exit 1
LOG="/root/repo/bench_logs/r5_queue3.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date) tree=$(pwd) sha=$(git rev-parse --short HEAD)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. profile_realistic bench (refit gate + wide damped solve) $(date)"
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
say "4. uniform headline guard (fused_all + auto solve, 30 iters) $(date)"
timeout 1500 python scripts/probe_fused_all.py 128 8192 0.1 30 >> "$LOG" 2>&1
sleep 30
say "5. profile_implicit ladybug (first implicit phase profile) $(date)"
timeout 1800 python scripts/profile_implicit.py ladybug 30 >> "$LOG" 2>&1
say "done $(date)"
