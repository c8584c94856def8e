#!/bin/bash
# Round-4 CPU fp64 oracle shard queue (VERDICT r3 tasks 4 / missing #2-#3).
# Runs low-priority in the background all round; each shard writes a durable
# per-shard JSON into artifacts/status_mix/ (merge with tools/merge_shards.py).
# Skips shards whose output already exists (idempotent across restarts).
cd /root/repo || exit 1
OUT=artifacts/status_mix
mkdir -p "$OUT"

run_shard() {
  local cfg=$1 sigma=$2 arm=$3 i=$4 n=$5 name=$6
  local f="$OUT/${name}_shard${i}of${n}.json"
  if [ -s "$f" ] && python -c "import json,sys; d=json.load(open('$f')); sys.exit(0 if d.get('arms') else 1)" 2>/dev/null; then
    echo "skip $f (done)"; return
  fi
  echo "=== $(date +%H:%M:%S) start $name shard $i/$n ==="
  nice -n 19 python tools/status_mix.py --config "$cfg" --sigma "$sigma" \
    --runs 128 --arm "$arm" --shard "$i/$n" \
    --out "$f" > "$OUT/${name}_shard${i}of${n}.log" 2>&1
  echo "=== $(date +%H:%M:%S) done $name shard $i/$n (rc=$?) ==="
}

# 1. Finish the reference-config sigma=0.3 oracle column (missing #3)
for i in 1 2 3 4 5 6 7; do
  run_shard ref 0.3 oracle "$i" 8 ref_s0.3_oracle
done
# 2. OSQP-faithful no-stall oracle, ref config (missing #2)
for i in 0 1 2 3 4 5 6 7; do
  run_shard ref 0.3 oracle-nostall "$i" 8 ref_s0.3_nostall
done
# 3. OSQP-faithful no-stall oracle, bench flagship config (missing #2)
for i in 0 1 2 3 4 5 6 7; do
  run_shard bench 0.75 oracle-nostall "$i" 8 bench_s0.75_nostall
done
echo "=== queue complete $(date) ==="
