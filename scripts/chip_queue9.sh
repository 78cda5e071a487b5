#!/bin/sh
# Round-4 on-chip queue #9: fused-path bench-scale realistic (post tile
# fix), W-dtype convergence-depth A/B on realistic shapes, adaptive BAL
# timing.
# Usage: sh scripts/chip_queue9.sh [logdir]
set -u
cd "$(dirname "$0")/.." || exit 1
LOGDIR=${1:-bench_logs}
mkdir -p "$LOGDIR"
LOG="$LOGDIR/r4_queue9.log"
export JAX_DEFAULT_MATMUL_PRECISION=highest

say() { echo "== $* ==" | tee -a "$LOG"; }

say "probe $(date)"
timeout 560 python -c "
import jax; d=jax.devices(); import jax.numpy as jnp; float(jnp.zeros(()))
print('probe ok', d)" >> "$LOG" 2>&1 || { say "probe FAILED — abort"; exit 1; }

say "1. bench-scale realistic direct, fused path (post tile fix) $(date)"
timeout 1800 python scripts/bal_realistic.py bench direct 30 \
  2>> "$LOG" | tail -1 | tee -a "$LOG"

sleep 30
say "2. W-dtype depth A/B on realistic shapes (f32 vs bf16, 60 iters) $(date)"
for wd in f32 bf16; do
  for shape in ladybug bench; do
    echo "-- $shape w_dtype=$wd" >> "$LOG"
    NLLSTPU_W_DTYPE=$wd timeout 1500 python scripts/bal_realistic.py "$shape" direct 60 \
      2>> "$LOG" | tail -1 | sed "s/^/[w=$wd] /" | tee -a "$LOG"
    sleep 30
  done
done

sleep 30
say "3. adaptive BAL on-chip (ContaminatedGaussian, ~35k obs) $(date)"
timeout 1800 python scripts/adaptive_bal_bench.py 2>> "$LOG" | tail -1 | tee -a "$LOG"

sleep 30
say "4. wide-reduced-space fused_all Mosaic probe (520 cams, tile 128) $(date)"
timeout 1500 python - >> "$LOG" 2>&1 <<'PYEOF'
import jax, jax.numpy as jnp, numpy as np
import nllstpu as nt
from nllstpu.core.optimize import compile_problem
from nllstpu.models.ba import make_pinhole_ba, perturb_ba
p, cams, lmks = make_pinhole_ba(520, 40, 2.0/520, noise=1e-3,
                                dtype=jnp.float32, batched="cm")
perturb_ba(p, lmks, 0.03, seed=2)
c = compile_problem(p, solver="schur", schur_family=nt.Euclidean(3))
assert c.schur_info.w_pm is not None, "w_pm should engage at tile 128"
cost, sys = jax.jit(c.assemble)(p.stacked_variables())
print("wide fused_all probe ok: cost", float(cost),
      "w shape", sys[4].shape, "dtype", sys[4].dtype)
PYEOF

say "done $(date)"
