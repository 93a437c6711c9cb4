#!/usr/bin/env bash
# One-command hardware (re-)validation + measurement pass.
#
# Run this whenever the TPU becomes reachable (the axon tunnel here can
# be down for many hours — see docs/ROUND3.md measurement note).  It
# collects, in order of value:
#   1. the TPU-marked hardware spot tests (Mosaic lowering of every
#      engine that changed since the last hardware session: device
#      walks, compile-bucketed wavefront kernels, sharded block kernel)
#   2. the driver headline benchmark (bench.py, one JSON line)
#   3. the mode matrix (bench_alignments.py: scores-only and
#      full-traceback alignments/sec — the device-walk path has no
#      hardware timing yet; expect the chromosome row to drop from
#      7.1 s to ~1.1 s and full-mode alignments/sec to rise sharply)
#   4. the single-pair wavefront engines (bench_wavefront_single.py:
#      row-scan + band-diagonal marginals)
#   5. the sharded pipeline (bench_wavefront_sp.py)
#
# Each step is independently timeboxed so one hung stage cannot eat the
# session; partial results are still written.  Logs land in
# bench_hw_logs/<UTC timestamp>/.
set -u
cd "$(dirname "$0")/.."

probe() {
    timeout 120 python -c \
        "import jax; d=jax.devices(); assert d and d[0].platform!='cpu', d; print(d)"
}

if ! probe; then
    echo "TPU not reachable (probe hung or returned CPU) — aborting." >&2
    exit 1
fi

ts=$(date -u +%Y%m%dT%H%M%SZ)
out="bench_hw_logs/$ts"
mkdir -p "$out"
echo "logs -> $out"

run() { # run <name> <timeout-s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name ==="
    timeout "$tmo" "$@" 2>&1 | tee "$out/$name.log" | tail -5
    echo "exit=${PIPESTATUS[0]}" | tee -a "$out/$name.log"
}

# 1. hardware spot tests (first compiles ~60-90s each through the
#    tunnel; the suite is small but give it room)
run tpu_tests 3600 env ALIGNER_TEST_PLATFORM=tpu \
    python -m pytest tests/ -q -k tpu

# 2. driver headline
run bench_headline 1800 python bench.py

# 3. alignments/sec incl. the on-device traceback (device walk default);
#    the chromosome-scale stage is opt-in since round 4 — the validation
#    pass is where it SHOULD run (ADVICE r3: commit a log backing the
#    huge-pair wall-time figures)
run bench_alignments 2400 python bench_alignments.py --huge 16384 32768

# 4. single-pair wavefront marginals (row-scan + band-diagonal)
run bench_wavefront_single 2400 python bench_wavefront_single.py

# 4b. the kernel mode matrix (scores/argmax/full/masked + PWM rows)
run bench_kernel_modes 2400 python bench_kernel_modes.py

# 5. sharded pipeline
run bench_wavefront_sp 2400 python bench_wavefront_sp.py

echo
echo "Done.  Update BENCH_modes.json / docs/PERF_NOTES.md /"
echo "docs/ROUND3.md from $out (the measurement-note paragraphs list"
echo "exactly which rows were pending hardware)."
