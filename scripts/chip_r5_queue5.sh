#!/bin/sh
# Round-5 on-chip queue #5: (a) isolate the wide damped solve vs the XLA
# chain at the bench-realistic shape (queue-4 measured ops.solve 3.52 ms
# under auto/wide vs r4's 2.87 ms XLA — same-session A/B needed), (b) the
# implicit backend after the B-minor matvec rewrite (queue-3 baseline:
# matvec 4.41 ms, end-to-end 16.0 it/s at ladybug), (c) implicit
# end-to-end numbers for the round, (d) the real bench.py headline.
set -u
cd "${1:-$(dirname "$0")/..}" || exit 1
LOG="/root/repo/bench_logs/r5_queue5.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest
say() { echo "== $* ==" | tee -a "$LOG"; }
say "probe $(date) tree=$(pwd) sha=$(git rev-parse --short HEAD)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }
say "1. profile_realistic bench SOLVE_IMPL=xla (A/B vs q4 auto=wide) $(date)"
timeout 1800 env NLLSTPU_SOLVE_IMPL=xla \
  python scripts/profile_realistic.py bench 50 >> "$LOG" 2>&1
sleep 30
say "2. profile_implicit ladybug (B-minor matvec rewrite) $(date)"
timeout 1800 python scripts/profile_implicit.py ladybug 30 >> "$LOG" 2>&1
sleep 30
say "3. bal_realistic ladybug implicit 60 $(date)"
timeout 1500 python scripts/bal_realistic.py ladybug implicit 60 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "4. bal_realistic bench implicit 30 $(date)"
timeout 1500 python scripts/bal_realistic.py bench implicit 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "5. bench.py headline (f32 default + gated bf16 secondary) $(date)"
timeout 1500 python bench.py 2>> "$LOG" | tail -1 | tee -a "$LOG"
sleep 30
say "6. dtype-PINNED uniform A/B vs r4 end (queue-4's A/B compared r4's
bf16 default to HEAD's f32 default — both legs f32 here) $(date)"
timeout 3600 env NLLSTPU_W_DTYPE=f32 python scripts/ab_bench.py \
  --ref 65cb84f --rounds 2 --iters 30 >> "$LOG" 2>&1
say "done $(date)"
