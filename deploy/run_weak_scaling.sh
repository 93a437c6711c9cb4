#!/usr/bin/env bash
# Weak-scaling measurement pass for the cross-chip wavefront pipeline.
#
# Run this on a multi-chip pod slice (none is reachable in the build
# environment — one v5e behind a tunnel).  Sweeps mesh sizes 1,2,4,..,N
# at constant per-device load and records measured vs modeled
# efficiency (BASELINE.md >=85% north star; analysis in
# docs/PERF_NOTES.md "(tr, J, n) efficiency surface").
#
# Logs land in bench_hw_logs/<UTC timestamp>/ next to the
# run_hw_validation.sh outputs.
set -u
cd "$(dirname "$0")/.."

timeout 120 python -c \
    "import jax; d=jax.devices(); assert d and d[0].platform!='cpu', d; print(len(d), 'devices')" \
    || { echo "TPU not reachable — aborting." >&2; exit 1; }

ts=$(date -u +%Y%m%dT%H%M%SZ)
out="bench_hw_logs/$ts"
mkdir -p "$out"
echo "logs -> $out"

# default: per-device 64k columns x 1M rows (J=64 at the auto band
# height; raise --rows toward chromosome scale for the >=0.85-at-n=32
# regime, see PERF_NOTES)
timeout 7200 python bench_weak_scaling.py "$@" 2>&1 \
    | tee "$out/weak_scaling.log"
echo "exit=${PIPESTATUS[0]}" | tee -a "$out/weak_scaling.log"
