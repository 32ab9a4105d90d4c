"""Latency benchmarks: prefill (TTFT) and e2e prefill+decode.

Mirrors the reference protocols:
  * prefill: synthetic all-ones prompt, warmup + N measured runs, mean/std/95%
    CI, peak memory, appended to a txt report
    (reference: benchmark/prefill.py:53-176, ctx sweep :252).
  * e2e: prefill + genlen greedy decode, tokens/s; method-specific paths for
    gemfilter (two-pass) handled by the Engine (reference: benchmark/e2e.py:
    152-243; sweep :375-378, H2O capped at 8192 :377-378).

Timing is fetch-forced (see fastkv_tpu.utils.timing: on the tunneled-TPU
backend jax.block_until_ready returns at dispatch).

CLI:
  python -m fastkv_tpu.bench.latency prefill --model_path DIR --method fastkv \
      --context_lengths 8192 32768 131072
  python -m fastkv_tpu.bench.latency e2e --model_path DIR --method fastkv --genlen 256
Use --preset llama-3.2-1b --random_weights to bench without a checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(args):
    from fastkv_tpu.core.config import (
        EngineConfig, Method, MethodConfig, MODEL_PRESETS,
    )

    plat = os.environ.get("FASTKV_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    if args.random_weights:
        cfg = MODEL_PRESETS[args.preset](dtype=args.dtype)
        from fastkv_tpu.models.llama import init_params_on_device

        params = init_params_on_device(cfg, seed=0)
    else:
        from fastkv_tpu.core.weights import load_params, model_config_from_dir

        cfg = model_config_from_dir(args.model_path, dtype=args.dtype)
        params = load_params(args.model_path, cfg)
    mcfg = MethodConfig(
        method=Method(args.method),
        window_size=args.window_size,
        kernel_size=args.kernel_size,
        pooling=args.pooling,
        eviction_mode=args.eviction_mode,
        max_capacity_prompt=args.max_capacity_prompts,
        tsp_len=args.tsp_len,
        retain_rate=args.retain_rate,
        tsp_rate=args.tsp_rate,
        tsp_idx=args.tsp_idx if args.tsp_idx >= 0
        else min(max(1, round(cfg.num_layers * 15 / 32)), cfg.num_layers - 2),
        filter_idx=args.filter_idx,
    )
    ecfg_kw = dict(use_pallas=not args.no_pallas)
    return cfg, params, mcfg, ecfg_kw


def stats(times):
    a = np.asarray(times)
    mean = float(a.mean())
    std = float(a.std())
    ci = 1.96 * std / max(len(a), 1) ** 0.5
    return mean, std, ci


def peak_mem() -> Optional[int]:
    try:
        s = jax.local_devices()[0].memory_stats()
        return s.get("peak_bytes_in_use", s.get("bytes_in_use"))
    except Exception:
        return None


def bench_prefill(args, cfg, params, mcfg, ecfg_kw, ctx: int):
    from fastkv_tpu.core.config import EngineConfig
    from fastkv_tpu.engine import prefill as pm
    from fastkv_tpu.utils.timing import force

    ecfg = EngineConfig(prefill_buckets=(ctx,), max_new_tokens=16, **ecfg_kw)
    shapes = pm.plan_shapes(cfg, mcfg, ecfg, ctx)
    tokens = jnp.ones((args.batch, ctx), jnp.int32)
    n = jnp.full((args.batch,), ctx, jnp.int32)
    pf = jax.jit(lambda p, t, nn: pm.prefill(p, cfg, mcfg, ecfg, shapes, t, nn))
    force(pf(params, tokens, n)[0])  # warmup/compile
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        force(pf(params, tokens, n)[0])
        times.append(time.perf_counter() - t0)
    mean, std, ci = stats(times)
    return {"context": ctx, "mean_s": mean, "std_s": std, "ci95_s": ci, "peak_mem": peak_mem()}


def bench_e2e(args, cfg, params, mcfg, ecfg_kw, ctx: int):
    from fastkv_tpu.core.config import EngineConfig
    from fastkv_tpu.engine import decode as dm
    from fastkv_tpu.engine import prefill as pm
    from fastkv_tpu.utils.timing import force

    genlen = args.genlen
    ecfg = EngineConfig(prefill_buckets=(ctx,), max_new_tokens=genlen, **ecfg_kw)
    shapes = pm.plan_shapes(cfg, mcfg, ecfg, ctx)
    tokens = jnp.ones((args.batch, ctx), jnp.int32)
    n = jnp.full((args.batch,), ctx, jnp.int32)
    pf = jax.jit(lambda p, t, nn: pm.prefill(p, cfg, mcfg, ecfg, shapes, t, nn))
    gg = jax.jit(
        lambda p, fl, c, nn: dm.greedy_generate(
            p, cfg, mcfg, shapes, fl, c, nn, genlen, None, 1,
            use_pallas=ecfg.decode_pallas,
        ),
        donate_argnums=(2,),
    )
    logits, cache = pf(params, tokens, n)
    force(logits)
    res, _ = gg(params, logits, cache, n)
    force(res.tokens)
    pts, dts = [], []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        logits, cache = pf(params, tokens, n)
        force(logits)
        pts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        res, _ = gg(params, logits, cache, n)
        force(res.tokens)
        dts.append(time.perf_counter() - t0)
    pm_, ps, pci = stats(pts)
    dm_, ds, dci = stats(dts)
    tok_s = args.batch * (genlen - 1) / dm_
    return {
        "context": ctx, "genlen": genlen, "prefill_mean_s": pm_, "prefill_ci95_s": pci,
        "decode_mean_s": dm_, "decode_ci95_s": dci, "tokens_per_s": tok_s,
        "peak_mem": peak_mem(),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["prefill", "e2e"])
    p.add_argument("--model_path", default=None)
    p.add_argument("--preset", default="llama-3.2-1b")
    p.add_argument("--random_weights", action="store_true")
    p.add_argument("--method", default="fastkv")
    p.add_argument("--context_lengths", nargs="+", type=int, default=[8192, 32768, 131072])
    p.add_argument("--genlen", type=int, default=256)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--save_dir", default="outputs/benchmark")
    p.add_argument("--window_size", type=int, default=8)
    p.add_argument("--kernel_size", type=int, default=7)
    p.add_argument("--pooling", default="maxpool")
    p.add_argument("--eviction_mode", default="proportional")
    p.add_argument("--max_capacity_prompts", type=int, default=512)
    p.add_argument("--tsp_len", type=int, default=2048)
    p.add_argument("--retain_rate", type=float, default=0.1)
    p.add_argument("--tsp_rate", type=float, default=0.2)
    p.add_argument("--tsp_idx", type=int, default=-1)
    p.add_argument("--filter_idx", type=int, default=13)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--no_pallas", action="store_true")
    args = p.parse_args(argv)
    if not args.model_path:
        args.random_weights = True

    from fastkv_tpu.utils.timing import warmup_device

    log(f"warmup {warmup_device():.1f}s")
    cfg, params, mcfg, ecfg_kw = build(args)
    os.makedirs(args.save_dir, exist_ok=True)
    out_txt = os.path.join(args.save_dir, f"{args.mode}_{cfg.name}_{args.method}.txt")
    results = []
    for ctx in args.context_lengths:
        if args.method in ("h2o",) and ctx > 8192:
            log(f"skip ctx {ctx} for h2o (reference caps at 8192; e2e.py:377-378)")
            continue
        r = (bench_prefill if args.mode == "prefill" else bench_e2e)(
            args, cfg, params, mcfg, ecfg_kw, ctx
        )
        results.append(r)
        log(json.dumps(r))
        with open(out_txt, "a") as f:
            f.write(json.dumps({"method": args.method, **r}) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
