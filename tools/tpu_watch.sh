#!/bin/bash
# Poll the axon TPU; when healthy, run the round-4 measurement sequence.
cd /root/repo || exit 1
mkdir -p artifacts/status_mix
while true; do
  if timeout 90 python -c "
import jax, numpy as np, jax.numpy as jnp
assert float(np.asarray(jnp.ones((8,8)).sum())) == 64.0
" 2>/dev/null; then
    echo "=== TPU healthy at $(date) — starting measurements ==="
    break
  fi
  echo "TPU down at $(date); retry in 300s"
  sleep 300
done

# 1. headline bench with round-4 defaults (also validates no perf regression)
echo "=== bench r4_base ==="
timeout 1500 python bench.py 2>&1 | tail -12

# 2. sigma=0.01 production arm, twice (accuracy fix + determinism, VERDICT
#    tasks 2 & 6) — fixed diagnostics now record finite residual ratios
for i in 1 2; do
  echo "=== status_mix sigma=0.01 prod run $i ==="
  timeout 2400 python tools/status_mix.py --config ref --sigma 0.01 \
    --runs 128 --arm prod \
    --out artifacts/status_mix/ref_s0.01_prod_r4_run$i.json 2>&1 | tail -25
done

# 3. op-level step profile (VERDICT task 1 evidence)
echo "=== profile_step ==="
timeout 1500 python tools/profile_step.py --batch 1024 --segs 2 --start-seg 6 \
  --top 45 > artifacts/profile_step_r4.txt 2>&1
tail -50 artifacts/profile_step_r4.txt

# 4. A/B sweep (apply strategies, smax off, bt, caps)
bash tools/tpu_r4_sweep.sh
echo "=== tpu_watch complete $(date) ==="
