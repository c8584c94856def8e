#!/bin/bash
# Round-5 CPU fp64 no-stall oracle shard queue (VERDICT r4 task 4).
# Two-worker version: `shard_queue_r5.sh A` and `shard_queue_r5.sh B` run
# disjoint shard lists concurrently on the 2-core host. Fixes vs r4 queue:
#   * per-machine JAX cache dir — the r4 shard-2 death was an XLA:CPU AOT
#     artifact compiled on a DIFFERENT host (cpu_aot_loader "could lead to
#     SIGILL", see artifacts/status_mix/ref_s0.3_nostall_shard2of8.log);
#   * one retry when the JSON is missing/invalid after a run (task 4's
#     "retry-on-missing-JSON" check).
cd /root/repo || exit 1
OUT=artifacts/status_mix
mkdir -p "$OUT"
export JAX_CACHE_DIR="/tmp/jax_cache_cpu_$(uname -n)_r5"

have() {
  [ -s "$1" ] && python -c "import json,sys; d=json.load(open('$1')); sys.exit(0 if d.get('arms') else 1)" 2>/dev/null
}

run_shard() {
  local cfg=$1 sigma=$2 arm=$3 i=$4 n=$5 name=$6
  local f="$OUT/${name}_shard${i}of${n}.json"
  for attempt in 1 2; do
    if have "$f"; then echo "skip $f (done)"; return; fi
    echo "=== $(date +%H:%M:%S) start $name shard $i/$n (attempt $attempt) ==="
    nice -n 19 python tools/status_mix.py --config "$cfg" --sigma "$sigma" \
      --runs 128 --arm "$arm" --shard "$i/$n" \
      --out "$f" > "$OUT/${name}_shard${i}of${n}.log" 2>&1
    echo "=== $(date +%H:%M:%S) done $name shard $i/$n (rc=$?) ==="
  done
  have "$f" || echo "!!! $name shard $i/$n FAILED twice — see log"
}

case "$1" in
  A)
    run_shard ref 0.3 oracle-nostall 2 8 ref_s0.3_nostall
    run_shard ref 0.3 oracle-nostall 3 8 ref_s0.3_nostall
    run_shard ref 0.3 oracle-nostall 4 8 ref_s0.3_nostall
    run_shard bench 0.75 oracle-nostall 2 8 bench_s0.75_nostall
    run_shard ref 0.3 oracle-nostall 6 8 ref_s0.3_nostall
    ;;
  B)
    run_shard bench 0.75 oracle-nostall 0 8 bench_s0.75_nostall
    run_shard bench 0.75 oracle-nostall 1 8 bench_s0.75_nostall
    run_shard ref 0.3 oracle-nostall 5 8 ref_s0.3_nostall
    run_shard bench 0.75 oracle-nostall 3 8 bench_s0.75_nostall
    run_shard ref 0.3 oracle-nostall 7 8 ref_s0.3_nostall
    ;;
  *) echo "usage: $0 A|B"; exit 2;;
esac
echo "=== queue $1 complete $(date) ==="
