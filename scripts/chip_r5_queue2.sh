#!/bin/sh
# Round-5 on-chip queue #2: the cap-64 bucket layout + probe-calibrated
# VMEM gate (after queue 1's ground-truth probe showed kb=96 OOMs at both
# tiles and kb=64@128 fits), plus the NEW column-panelized wide-wc damped
# solve kernel (VERDICT r5 item 2).  Pass the pinned worktree as $1.
set -u
cd "${1:-$(dirname "$0")/..}" || exit 1
LOG="/root/repo/bench_logs/r5_queue2.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date) tree=$(pwd) sha=$(git rev-parse --short HEAD)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. probe_vmem_model all (cap-64 points + damped_wide) $(date)"
timeout 2400 python scripts/probe_vmem_model.py all >> "$LOG" 2>&1
sleep 30
say "2. profile_realistic bench (cap-64 + wide damped solve) $(date)"
timeout 1800 python scripts/profile_realistic.py bench 50 >> "$LOG" 2>&1
sleep 30
say "3. bal_realistic bench direct 30 (queue-18 bar: >=86.6 it/s) $(date)"
timeout 1500 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "4. bal_realistic ladybug direct 60 $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug direct 60 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "5. uniform headline guard: ab-style single leg (bench shape) $(date)"
timeout 1500 python scripts/probe_fused_all.py 128 8192 0.1 30 >> "$LOG" 2>&1
say "done $(date)"
