#!/usr/bin/env bash
# RULER at 4K/8K/16K (mirrors reference scripts/eval_ruler.sh)
set -euo pipefail
method=${METHOD:-fastkv}
model_path=${MODEL_PATH:?"set MODEL_PATH"}
save_dir=${SAVE_DIR:-outputs/results_ruler}
for ctx in 4096 8192 16384; do
  python -m fastkv_tpu.evals.ruler run \
      --method "${method}" --model_path "${model_path}" \
      --context_length "${ctx}" --save_dir "${save_dir}/${ctx}" \
      --eviction_mode proportional --tsp_rate 0.2 --retain_rate 0.1 --tsp_idx 15
  python -m fastkv_tpu.evals.ruler score --results_dir "${save_dir}/${ctx}"
done
