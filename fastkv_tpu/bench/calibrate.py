"""PyramidInfer retain-rate calibration.

Reproduces the reference calibration tool
(baselines/pyramidinfer/profile_pyramidinfer.py:96-116): for each sequence
length and candidate prefill_decay_ratio, report the achieved average
retain-rate (mean over layers of per-layer cache length / prompt length) so a
decay ratio can be picked for a target retain budget.

The reference measures this empirically by running a ones-prompt through the
model and reading cache shapes — necessary there because compression is buried
in the forward. Here the pyramid schedule is a pure function of
(seq_len, config) (fastkv_tpu.engine.pyramid.plan_layer_lengths), so the exact
answer is analytic; `--empirical` additionally runs the real engine on random
weights and reads the validity-masked cache counts as a cross-check (the two
differ only by the static capacity_align rounding).

Usage:
  python -m fastkv_tpu.bench.calibrate --model llama-3.2-1b \
      --seqlens 1000 2000 4000 --decay_ratios 0.01 0.3 0.7 \
      [--config fastkv_tpu/configs/pyramidinfer/llama_60.json] [--empirical]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from fastkv_tpu.core.config import (
    MODEL_PRESETS,
    EngineConfig,
    Method,
    MethodConfig,
    ModelConfig,
)


def analytic_retain_rate(
    cfg: ModelConfig, mcfg: MethodConfig, seq_len: int, align: int = 1
) -> float:
    """Mean over layers of (per-layer cache length / seq_len).

    align=1 matches the reference's dynamic shapes; the engine's static plan
    uses align=capacity_align (rounded up, so static retain >= dynamic retain).
    """
    from fastkv_tpu.engine import pyramid

    lengths = pyramid.plan_layer_lengths(cfg, mcfg, seq_len, align=align)
    # layer l's cache is its input sequence -> lengths[0..L-1]
    return sum(lengths[: cfg.num_layers]) / (cfg.num_layers * seq_len)


def empirical_retain_rate(
    cfg: ModelConfig, mcfg: MethodConfig, seq_len: int, align: int
) -> float:
    """Run the real engine prefill (random weights) and count valid entries."""
    import jax.numpy as jnp
    import numpy as np

    from fastkv_tpu.engine.generate import Engine
    from fastkv_tpu.models.llama import init_params

    params = init_params(cfg, seed=0)
    ecfg = EngineConfig(
        prefill_buckets=(seq_len,), max_new_tokens=8, use_pallas=False,
        capacity_align=align,
    )
    eng = Engine(params, cfg, mcfg, ecfg)
    tokens = jnp.ones((1, seq_len), jnp.int32)
    _, cache = eng.prefill_fn(seq_len, 8)(params, tokens, jnp.array([seq_len], jnp.int32))
    counts = np.asarray(cache.valid[:, 0, 0, :].sum(axis=-1))
    return float(counts.mean() / seq_len)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="llama-3.1-8b", choices=sorted(MODEL_PRESETS))
    ap.add_argument("--config", default=None,
                    help="reference-format pyramidinfer config JSON")
    ap.add_argument("--seqlens", type=int, nargs="+",
                    default=[1000, 2000, 3000, 4000])
    ap.add_argument("--decay_ratios", type=float, nargs="+", default=[0.01])
    ap.add_argument("--empirical", action="store_true")
    ap.add_argument("--capacity_align", type=int, default=8)
    args = ap.parse_args(argv)

    cfg = MODEL_PRESETS[args.model]()
    mcfg = MethodConfig(method=Method.PYRAMIDINFER)
    if args.config:
        mcfg = mcfg.with_pyramidinfer_json(args.config)

    for seq_len in args.seqlens:
        for dr in args.decay_ratios:
            m = dataclasses.replace(mcfg, pyramid_decay_ratio=dr)
            rate = analytic_retain_rate(cfg, m, seq_len) * 100
            line = (f"seqlen={seq_len}, prefill_decay_ratio={dr}, "
                    f"retain_rate={rate:.2f}%")
            if args.empirical:
                emp = empirical_retain_rate(cfg, m, seq_len, args.capacity_align) * 100
                line += f", measured={emp:.2f}% (align={args.capacity_align})"
            print(line)


if __name__ == "__main__":
    main()
