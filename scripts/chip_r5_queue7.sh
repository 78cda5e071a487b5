#!/bin/sh
# Round-5 on-chip queue #7: final round numbers with the wide damped
# kernel RESTORED as auto (the end-to-end A/B overrules the microbench:
# 130.6/157.9 it/s with the kernel vs 90.1/124.5 on the XLA chain,
# r5_queue4 vs r5_queue6), plus the fused-trial experiment at the
# realistic shape (assemble 2.46 ms ~ cost 1.81 ms there, so replacing
# the trial cost pass with a full assemble should win at ~1.7
# trips/iter — it lost on the uniform shape where cost is 3x cheaper).
set -u
cd "${1:-$(dirname "$0")/..}" || exit 1
LOG="/root/repo/bench_logs/r5_queue7.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date) tree=$(pwd) sha=$(git rev-parse --short HEAD)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. bal_realistic bench direct 30 (wide kernel auto restored) $(date)"
timeout 1500 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "2. bal_realistic ladybug direct 60 $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug direct 60 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "3. bench FUSED_TRIAL=1 experiment (bench-realistic direct) $(date)"
timeout 1500 env NLLSTPU_FUSED_TRIAL=1 \
  python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "4. bench.py final headline $(date)"
timeout 1500 python bench.py 2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "5. profile_implicit ladybug retry (q6 leg 3 timed out under host-CPU
contention from the concurrent Venice run) $(date)"
timeout 1800 python scripts/profile_implicit.py ladybug 30 >> "$LOG" 2>&1
sleep 30
say "6. dtype-PINNED uniform A/B vs r4 end (q6 leg hit the 900s
per-leg subprocess timeout under contention) $(date)"
timeout 5400 env NLLSTPU_W_DTYPE=f32 python scripts/ab_bench.py \
  --ref 65cb84f --rounds 2 --iters 30 --timeout 1400 >> "$LOG" 2>&1
say "done $(date)"
