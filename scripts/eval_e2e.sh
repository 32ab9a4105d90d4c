#!/usr/bin/env bash
# E2E latency: ctx {8K,32K,128K}, genlen 256 (mirrors reference scripts/eval_e2e.sh)
set -euo pipefail
method=${METHOD:-fastkv}
for m in fullkv ${method}; do
  python -m fastkv_tpu.bench.latency e2e \
      --preset "${PRESET:-llama-3.1-8b}" ${MODEL_PATH:+--model_path "$MODEL_PATH"} \
      ${MODEL_PATH:+} $( [ -z "${MODEL_PATH:-}" ] && echo --random_weights ) \
      --method "${m}" --context_lengths 8192 32768 131072 --genlen 256 \
      --eviction_mode proportional --tsp_rate 0.2 --retain_rate 0.1
done
