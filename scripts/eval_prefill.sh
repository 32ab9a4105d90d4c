#!/usr/bin/env bash
# Prefill TTFT sweep over the 3-model zoo, 5 runs (mirrors reference scripts2/eval_prefill.sh)
set -euo pipefail
for preset in llama-3.1-8b ministral-8b mistral-nemo-12b; do
  for m in fullkv fastkv snapkv streamingllm gemfilter h2o pyramidinfer; do
    python -m fastkv_tpu.bench.latency prefill \
        --preset "${preset}" $( [ -z "${MODEL_PATH:-}" ] && echo --random_weights ) \
        ${MODEL_PATH:+--model_path "$MODEL_PATH"} \
        --method "${m}" --context_lengths 8192 32768 131072 --runs 5 \
        --eviction_mode proportional --tsp_rate 0.2 --retain_rate 0.1
  done
done
