#!/usr/bin/env bash
# Paper-style LongBench retain-rate sweeps (mirrors reference
# scripts2/longbench_h2o.sh + scripts2/longbench_gemfilter.sh: the same
# method at retain_rate 0.1 and 0.2, per-model canonical tsp/filter index —
# tsp_idx 15 for Llama-3.1-8B, 17 for Ministral-8B, 19 for Mistral-Nemo,
# reference scripts2/*:4 + SURVEY.md §2.2 driver row).
#
# Usage: MODEL_PATH=/path/to/hf_model [PRESET=llama-3.1-8b] \
#        [METHODS="h2o gemfilter"] [RETAIN_RATES="0.1 0.2"] \
#        scripts/longbench_sweeps.sh
set -euo pipefail
model_path=${MODEL_PATH:?"set MODEL_PATH to a local HF model dir"}
preset=${PRESET:-llama-3.1-8b}
methods=${METHODS:-"h2o gemfilter"}
retain_rates=${RETAIN_RATES:-"0.1 0.2"}
eviction_mode=proportional
tsp_rate=0.2

case "${preset}" in
  llama-3.1-8b) tsp_idx=15 ;;
  ministral-8b) tsp_idx=17 ;;
  mistral-nemo-12b) tsp_idx=19 ;;
  *) tsp_idx=${TSP_IDX:?"unknown preset ${preset}: set TSP_IDX"} ;;
esac

for method in ${methods}; do
  for retain_rate in ${retain_rates}; do
    save_dir=${SAVE_DIR:-outputs/results_longbench}/${preset}_${method}_r${retain_rate}
    python -m fastkv_tpu.evals.longbench run \
        --method "${method}" \
        --model_path "${model_path}" \
        --save_dir "${save_dir}" \
        --eviction_mode "${eviction_mode}" \
        --tsp_rate "${tsp_rate}" \
        --tsp_idx "${tsp_idx}" \
        --filter_idx "${tsp_idx}" \
        --retain_rate "${retain_rate}"
    python -m fastkv_tpu.evals.longbench score --results_dir "${save_dir}"
  done
done
