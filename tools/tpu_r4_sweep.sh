#!/bin/bash
# Round-4 TPU measurement sweep — run when the chip is healthy.
# Each step appends one labeled JSON line to artifacts/r4_tpu_sweep.jsonl.
cd /root/repo || exit 1
OUT=artifacts/r4_tpu_sweep.jsonl
mkdir -p artifacts

run_bench() {
  local label=$1; shift
  echo "=== $(date +%H:%M:%S) bench $label ($*) ==="
  local line
  line=$(env "$@" timeout 1200 python bench.py 2>/tmp/bench_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"label\": \"$label\", \"bench\": $line}" >> "$OUT"
    echo "$label -> $line"
  else
    echo "$label FAILED:"; tail -5 /tmp/bench_err.log
  fi
}

# 1. baseline reproduction with round-4 solver changes (equil smax=32 default)
run_bench r4_base
# 2. equilibration off (isolates its cost on the flagship; success effect is
#    measured separately by status_mix at sigma=0.01)
run_bench r4_smax0 BENCH_SMAX=0
# 3. tinv apply strategies
run_bench r4_vpu BENCH_APPLY=vpu
run_bench r4_blockdiag BENCH_APPLY=blockdiag
# 4. bt=64 with the best apply (re-test: round-3 lost end-to-end at bt=64)
run_bench r4_vpu_bt64 BENCH_APPLY=vpu BENCH_TILE=64
# 5. fixed-cost decomposition: cap the solve at N iterations; the wall-time
#    intercept vs chunk count separates fixed per-step cost from chunk cost
run_bench r4_cap25 BENCH_MAX_ITER=25
run_bench r4_cap100 BENCH_MAX_ITER=100
run_bench r4_cap25_nocompact BENCH_MAX_ITER=25 BENCH_COMPACT=
run_bench r4_cap25_norefresh BENCH_MAX_ITER=25 BENCH_REFRESH_DIV=1
echo "=== sweep done $(date) ==="
