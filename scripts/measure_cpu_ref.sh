#!/bin/sh
# Re-measure the committed CPU baseline used by bench.py's vs_baseline
# (scripts/cpu_ref.json).  Run from the repo root; paste the printed stats
# into cpu_ref.json together with the BENCH_NCAM/NLMK/VIS shape.
cd "$(dirname "$0")/.." || exit 1
exec timeout 1800 python bench.py --worker cpu 5
