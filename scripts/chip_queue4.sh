#!/bin/sh
# Round-3 on-chip queue #2: fused_all validation + decisive end-to-end A/B
# + the CLAUDE.md REVALIDATE item (838k fulljit implicit).
# Usage: sh scripts/chip_queue4.sh [logdir]
set -u
cd "$(dirname "$0")/.." || exit 1
LOGDIR=${1:-bench_logs}
mkdir -p "$LOGDIR"
LOG="$LOGDIR/r3_queue2.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest

say() { echo "== $* ==" | tee -a "$LOG"; }

say "probe $(date)"
timeout 300 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }

say "1. fused_all on-chip validation + assemble timing $(date)"
timeout 1800 python scripts/probe_fused_all.py >> "$LOG" 2>&1

say "2. end-to-end A/B onehot vs fused_all (30it, bf16, x3 interleaved) $(date)"
for i in 1 2 3; do
  for impl in onehot fused_all; do
    echo "-- round $i impl=$impl" >> "$LOG"
    if [ "$impl" = onehot ]; then unset NLLSTPU_W_IMPL; else export NLLSTPU_W_IMPL=$impl; fi
    timeout 900 python bench.py --worker tpu 30 \
      2>> "$LOG" | tail -1 | sed "s/^/[impl=$impl r$i] /" | tee -a "$LOG"
    sleep 3
  done
done
unset NLLSTPU_W_IMPL

say "3. REVALIDATE: 838k fulljit implicit (chunk-25 auto) $(date)"
NLLSTPU_GIANT_FULLJIT=1 timeout 1800 \
  python scripts/giant_implicit.py fulljit >> "$LOG" 2>&1 \
  || say "3. fulljit leg FAILED (rc=$?)"

say "done $(date)"
