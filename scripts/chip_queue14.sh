#!/bin/sh
# Round-4 on-chip queue #14: fresh f32 solve-phase breakdown at the
# headline shape (pm-aware stage decomposition) — sizing the solve-gap
# levers (VERDICT item 4) before the bf16x3 pallas reduction attempt.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG="bench_logs/r4_queue14.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. solve phases, default knobs (f32 W, fused_all pm) $(date)"
timeout 1800 python scripts/profile_solve_phases.py 128 8192 0.1 50 \
  >> "$LOG" 2>&1
say "2. solve phases, bf16 W (for the delta) $(date)"
sleep 30
NLLSTPU_W_DTYPE=bf16 timeout 1500 python scripts/profile_solve_phases.py \
  128 8192 0.1 50 >> "$LOG" 2>&1
say "done $(date)"
