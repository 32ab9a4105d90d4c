#!/usr/bin/env bash
# Needle-in-a-Haystack 16K..128K x 10 depths (mirrors reference scripts/eval_needle.sh)
set -euo pipefail
method=${METHOD:-fastkv}
model_path=${MODEL_PATH:?"set MODEL_PATH"}
save_dir=${SAVE_DIR:-outputs/results_needle}
python -m fastkv_tpu.evals.needle run \
    --method "${method}" --model_path "${model_path}" --save_dir "${save_dir}" \
    --eviction_mode proportional --tsp_rate 0.2 --retain_rate 0.1 --tsp_idx 15
python -m fastkv_tpu.evals.needle visualize --save_dir "${save_dir}"
