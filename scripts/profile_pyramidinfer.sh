#!/usr/bin/env bash
# Retain-rate calibration (mirrors reference scripts/profile_pyramidinfer.sh)
set -euo pipefail
python -m fastkv_tpu.bench.calibrate \
    --model "${PRESET:-llama-3.1-8b}" \
    --config fastkv_tpu/configs/pyramidinfer/llama_35.json \
    --seqlens 1000 2000 3000 4000 --decay_ratios 0.01
