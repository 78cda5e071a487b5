#!/bin/sh
# Round-5 on-chip queue #6: final round numbers — realistic direct at the
# corrected auto solve (XLA chain for wide wc after the r5_queue5 A/B),
# implicit after the one-hot v-expansion, the dtype-PINNED uniform A/B
# that queue 5 lost to the dangling-symlink bug, and the final headline.
set -u
cd "${1:-$(dirname "$0")/..}" || exit 1
LOG="/root/repo/bench_logs/r5_queue6.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date) tree=$(pwd) sha=$(git rev-parse --short HEAD)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. bal_realistic bench direct 30 (auto solve now XLA at wc=1152) $(date)"
timeout 1500 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "2. bal_realistic ladybug direct 60 $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug direct 60 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "3. profile_implicit ladybug (one-hot v-expansion) $(date)"
timeout 1800 python scripts/profile_implicit.py ladybug 30 >> "$LOG" 2>&1
sleep 30
say "4. dtype-PINNED uniform A/B vs r4 end (both legs f32) $(date)"
timeout 3600 env NLLSTPU_W_DTYPE=f32 python scripts/ab_bench.py \
  --ref 65cb84f --rounds 2 --iters 30 >> "$LOG" 2>&1
sleep 30
say "5. bench.py final headline $(date)"
timeout 1500 python bench.py 2>> "$LOG" | tail -1 | tee -a "$LOG"
say "done $(date)"
