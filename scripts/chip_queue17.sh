#!/bin/sh
# Round-4 on-chip queue #17: realistic-shape phase profiles (where does
# the 11.5 ms bench-realistic iteration go?) + headline bf16 breakdown
# with the damped kernel default.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG="bench_logs/r4_queue17.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. profile_realistic bench (f32 defaults) $(date)"
timeout 1800 python scripts/profile_realistic.py bench 50 >> "$LOG" 2>&1
sleep 30
say "2. profile_realistic ladybug (f32 defaults) $(date)"
timeout 1800 python scripts/profile_realistic.py ladybug 50 >> "$LOG" 2>&1
sleep 30
say "3. solve phases, bf16 W + damped-kernel default (headline config) $(date)"
NLLSTPU_W_DTYPE=bf16 timeout 1500 python \
  scripts/profile_solve_phases.py 128 8192 0.1 50 >> "$LOG" 2>&1
say "done $(date)"
