#!/bin/sh
# Round-4 on-chip queue #15c: damped bf16x3 reduction kernel validation
# (queue 15 leg 1 caught the inherited-HIGHEST Mosaic rejection; this
# runs the fixed kernel): phases, end-to-end f32 A/B, convergence parity.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG="bench_logs/r4_queue15c.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. solve phases, SOLVE_IMPL=pallas (damped kernel, f32 W) $(date)"
NLLSTPU_SOLVE_IMPL=pallas timeout 1800 python \
  scripts/profile_solve_phases.py 128 8192 0.1 50 >> "$LOG" 2>&1
sleep 30
say "2. bench worker f32 SOLVE_IMPL=pallas (A leg) $(date)"
NLLSTPU_SOLVE_IMPL=pallas timeout 1500 python bench.py --worker tpu 30 f32 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "3. bench worker f32 forced xla (B leg) $(date)"
NLLSTPU_SOLVE_IMPL=xla timeout 1500 python bench.py --worker tpu 30 f32 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "4. bench worker f32 SOLVE_IMPL=pallas (A leg, round 2) $(date)"
NLLSTPU_SOLVE_IMPL=pallas timeout 1500 python bench.py --worker tpu 30 f32 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "5. bench worker f32 forced xla (B leg, round 2) $(date)"
NLLSTPU_SOLVE_IMPL=xla timeout 1500 python bench.py --worker tpu 30 f32 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "6. ladybug direct 60 iters, SOLVE_IMPL=pallas (convergence parity) $(date)"
NLLSTPU_SOLVE_IMPL=pallas timeout 1500 python scripts/bal_realistic.py \
  ladybug direct 60 2>> "$LOG" | tail -1 | tee -a "$LOG"
say "done $(date)"
