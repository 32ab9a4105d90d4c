#!/usr/bin/env bash
# Canonical LongBench run (mirrors reference scripts/eval_longbench.sh:1-21:
# method=fastkv, proportional eviction, tsp_rate=0.2, retain_rate=0.1, tsp_idx=15)
set -euo pipefail
method=${METHOD:-fastkv}
eviction_mode=proportional
tsp_idx=15
tsp_rate=0.2
retain_rate=0.1
model_path=${MODEL_PATH:?"set MODEL_PATH to a local HF model dir (e.g. Meta-Llama-3.1-8B-Instruct)"}
save_dir=${SAVE_DIR:-outputs/results_longbench}

python -m fastkv_tpu.evals.longbench run \
    --method "${method}" \
    --model_path "${model_path}" \
    --save_dir "${save_dir}" \
    --eviction_mode "${eviction_mode}" \
    --tsp_rate "${tsp_rate}" \
    --tsp_idx "${tsp_idx}" \
    --retain_rate "${retain_rate}"

python -m fastkv_tpu.evals.longbench score --results_dir "${save_dir}"
