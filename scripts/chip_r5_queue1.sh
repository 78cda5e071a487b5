#!/bin/sh
# Round-5 on-chip queue #1: settle the round-4 queue-18 regression
# (VERDICT r5 item 1) — empirical Mosaic VMEM accounting probe at the
# failing bucket shape, then realistic-shape phase profiles + end-to-end
# convergence at HEAD with the corrected _fused_tile_l gate.
# Runs from a DETACHED WORKTREE (pass its path as $1) so concurrent
# development in the main repo can't change the code mid-queue.
set -u
cd "${1:-$(dirname "$0")/..}" || exit 1
LOG="/root/repo/bench_logs/r5_queue1.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date) tree=$(pwd) sha=$(git rev-parse --short HEAD)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. probe_vmem_model (Mosaic accounting ground truth) $(date)"
timeout 1500 python scripts/probe_vmem_model.py >> "$LOG" 2>&1
sleep 30
say "2. profile_realistic bench $(date)"
timeout 1800 python scripts/profile_realistic.py bench 50 >> "$LOG" 2>&1
sleep 30
say "3. bal_realistic bench direct 30 (the queue-18 bar: >=86.6 it/s) $(date)"
timeout 1500 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "4. bal_realistic ladybug direct 60 $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug direct 60 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
say "done $(date)"
