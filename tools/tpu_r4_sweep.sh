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

# refresh-cost A/B (the profiled ~50 ms/step refresh conds)
run_bench r4_warm1 BENCH_WARM_ITERS=1
run_bench r4_warm2 BENCH_WARM_ITERS=2
run_bench r4_cold10 BENCH_COLD_ITERS=10
# tinv apply strategies
run_bench r4_vpu BENCH_APPLY=vpu
run_bench r4_blockdiag BENCH_APPLY=blockdiag
# equilibration off (isolates its flagship cost)
run_bench r4_smax0 BENCH_SMAX=0
# fixed-cost decomposition: cap the solve at N iterations
run_bench r4_cap25 BENCH_MAX_ITER=25
run_bench r4_cap100 BENCH_MAX_ITER=100
echo "=== sweep done $(date) ==="
