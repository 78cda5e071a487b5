#!/bin/sh
# Round-3 on-chip measurement queue #1: establish WHERE the 13.9 ms/iter
# goes before optimizing (VERDICT.md round-3 item #1).  Runs from a clean
# worktree snapshot so the main tree stays editable; logs are written into
# the repo's bench_logs/ so every perf claim has a committed artifact
# (VERDICT.md round-3 item #8).
#
# Legs (all subprocess+timeout; chip exclusive — never run concurrently):
#   1. HEAD bench (30 LM iters, default knobs = onehot/xla/bf16)
#   2. per-phase profile at default knobs
#   3. per-phase profile, SOLVE_IMPL=pallas
#   4. per-phase profile, W_IMPL=pallas (p-major placement kernel)
#   5. per-phase profile, W_IMPL=fused + SOLVE_IMPL=pallas
#   6. assemble split: jac_obs vs jac_cam vs reductions+W
#   7. XLA cost_analysis bytes (assemble / solve / LM body)
#   8. per-phase profile at f32 (history comparison)
# Usage: sh scripts/chip_queue3.sh [logdir]
set -u
cd "$(dirname "$0")/.." || exit 1
LOGDIR=${1:-bench_logs}
mkdir -p "$LOGDIR"
LOG="$LOGDIR/r3_queue1.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest  # match the bench worker

say() { echo "== $* ==" | tee -a "$LOG"; }

say "probe $(date)"
timeout 300 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }

say "1. HEAD bench 30it default(bf16) $(date)"
timeout 900 python bench.py --worker tpu 30 >> "$LOG" 2>&1

say "2. phases onehot/xla/bf16 $(date)"
NLLSTPU_W_DTYPE=bf16 timeout 900 python scripts/profile_solve_phases.py >> "$LOG" 2>&1

say "3. phases onehot/PALLAS-solve/bf16 $(date)"
NLLSTPU_SOLVE_IMPL=pallas NLLSTPU_W_DTYPE=bf16 timeout 900 \
  python scripts/profile_solve_phases.py >> "$LOG" 2>&1

say "4. phases PALLAS-W/xla/bf16 $(date)"
NLLSTPU_W_IMPL=pallas NLLSTPU_W_DTYPE=bf16 timeout 900 \
  python scripts/profile_solve_phases.py >> "$LOG" 2>&1

say "5. phases FUSED-W/PALLAS-solve/bf16 $(date)"
NLLSTPU_W_IMPL=fused NLLSTPU_SOLVE_IMPL=pallas NLLSTPU_W_DTYPE=bf16 timeout 900 \
  python scripts/profile_solve_phases.py >> "$LOG" 2>&1

say "6. assemble split (jac legs vs reductions+W) $(date)"
timeout 900 python scripts/profile_assemble.py >> "$LOG" 2>&1

say "7. cost_analysis bytes $(date)"
timeout 900 python scripts/cost_bytes.py >> "$LOG" 2>&1

say "8. phases onehot/xla/F32 $(date)"
NLLSTPU_W_DTYPE=f32 timeout 900 \
  python scripts/profile_solve_phases.py >> "$LOG" 2>&1

say "done $(date)"
