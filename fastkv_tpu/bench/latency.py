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
    from fastkv_tpu.utils.profiling import peak_bytes

    return peak_bytes()


def bench_prefill(args, cfg, params, mcfg, ecfg_kw, ctx: int):
    """TTFT per method: gemfilter's TTFT includes BOTH passes of its two-pass
    scheme (reference: benchmark/prefill.py gemfilter path via
    gemfilter_generate_selection_prefill) and pyramidinfer's includes the
    decode-state seeding — both via the Engine's method routing."""
    from fastkv_tpu.core.config import EngineConfig
    from fastkv_tpu.utils.timing import force

    ecfg = EngineConfig(prefill_buckets=(ctx,), max_new_tokens=16, **ecfg_kw)
    run_prefill, _ = _e2e_runners(cfg, params, mcfg, ecfg, ctx, 16, args.batch)
    force(run_prefill()[0])  # warmup/compile
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        force(run_prefill()[0])
        times.append(time.perf_counter() - t0)
    mean, std, ci = stats(times)
    return {"context": ctx, "mean_s": mean, "std_s": std, "ci95_s": ci, "peak_mem": peak_mem()}


def _e2e_runners(cfg, params, mcfg, ecfg, ctx: int, genlen: int, batch: int):
    """Build (run_prefill, run_decode) for one method through the Engine's
    method routing — gemfilter benches its real two-pass path and pyramidinfer
    its generation-stage re-compression, matching the reference's per-method
    e2e paths (reference: benchmark/e2e.py:158 standard, :188-195 gemfilter
    two-pass prefill, :218-232 pyramidinfer generate)."""
    from fastkv_tpu.core.config import Method
    from fastkv_tpu.engine.generate import Engine

    eng = Engine(params, cfg, mcfg, ecfg)
    tokens = jnp.ones((batch, ctx), jnp.int32)
    n = jnp.full((batch,), ctx, jnp.int32)
    eos = jnp.asarray([0], jnp.int32)

    if mcfg.method == Method.GEMFILTER:
        from fastkv_tpu.engine import gemfilter

        cap = gemfilter.filter_capacity(mcfg, ctx, ecfg.capacity_align)
        sel = eng._gemfilter_select_fn(ctx, cap)
        eng2 = eng._pass2_engine()
        pf2 = eng2.prefill_fn(cap, genlen)
        gg2 = eng2.generate_fn(cap, genlen, 0, 1)

        def run_prefill():
            nt, nc, _ = sel(params, tokens, n)
            logits, cache = pf2(params, nt, nc)
            return (logits, cache, nc)

        def run_decode(st):
            res, _ = gg2(params, st[0], st[1], st[2], eos)
            return res.tokens

    elif mcfg.method == Method.PYRAMIDINFER:
        ppf = eng._pyramid_prefill_fn(ctx, genlen)
        pgg = eng._pyramid_generate_fn(ctx, genlen, 0, 1)

        def run_prefill():
            logits, cache, pstate = ppf(params, tokens, n)
            return (logits, cache, pstate)

        def run_decode(st):
            res, _ = pgg(params, st[0], st[1], st[2], n, eos)
            return res.tokens

    else:
        pf = eng.prefill_fn(ctx, genlen)
        gg = eng.generate_fn(ctx, genlen, 0, 1)

        def run_prefill():
            logits, cache = pf(params, tokens, n)
            return (logits, cache)

        def run_decode(st):
            res, _ = gg(params, st[0], st[1], n, eos)
            return res.tokens

    return run_prefill, run_decode


def bench_e2e(args, cfg, params, mcfg, ecfg_kw, ctx: int):
    from fastkv_tpu.core.config import EngineConfig
    from fastkv_tpu.utils.timing import force

    genlen = args.genlen
    ecfg = EngineConfig(prefill_buckets=(ctx,), max_new_tokens=genlen, **ecfg_kw)
    run_prefill, run_decode = _e2e_runners(
        cfg, params, mcfg, ecfg, ctx, genlen, args.batch
    )
    st = run_prefill()
    force(st[0])
    force(run_decode(st))
    pts, dts = [], []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        st = run_prefill()
        force(st[0])
        pts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = run_decode(st)
        force(out)
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
    p.add_argument(
        "--trace", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the measured runs into DIR "
        "(TensorBoard/Perfetto-compatible; utils.profiling.trace)",
    )
    p.add_argument(
        "--jsonl", default=None, metavar="PATH",
        help="append structured per-phase JSONL records (ts/phase/metrics) to "
        "PATH via utils.profiling.PhaseLogger — the SURVEY §5 observability "
        "stream ('-' = stderr)",
    )
    p.add_argument(
        "--h2o_no_cap", action="store_true",
        help="lift the reference's 8192-context cap on H2O: the chunked "
        "O(s)-memory scorer (ops.attention.h2o_scores) removes the O(n^2) "
        "materialization that forced the cap (reference eval/run_longbench.py:"
        "117-119). Default keeps the cap for protocol parity.",
    )
    args = p.parse_args(argv)
    if not args.model_path:
        args.random_weights = True

    plat = os.environ.get("FASTKV_PLATFORM")
    if plat:  # must happen before any device use (warmup included)
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    from fastkv_tpu.utils.timing import warmup_device

    log(f"warmup {warmup_device():.1f}s")
    cfg, params, mcfg, ecfg_kw = build(args)
    os.makedirs(args.save_dir, exist_ok=True)
    out_txt = os.path.join(args.save_dir, f"{args.mode}_{cfg.name}_{args.method}.txt")
    results = []
    import contextlib

    from fastkv_tpu.utils import profiling

    plogger = None
    if args.jsonl:
        stream = sys.stderr if args.jsonl == "-" else open(args.jsonl, "a")
        plogger = profiling.PhaseLogger(stream=stream)

    tracer = profiling.trace(args.trace) if args.trace else contextlib.nullcontext()
    with tracer:
        for ctx in args.context_lengths:
            if args.method in ("h2o",) and ctx > 8192 and not args.h2o_no_cap:
                log(
                    f"skip ctx {ctx} for h2o (reference caps at 8192, "
                    f"e2e.py:377-378; pass --h2o_no_cap to lift it)"
                )
                continue
            r = (bench_prefill if args.mode == "prefill" else bench_e2e)(
                args, cfg, params, mcfg, ecfg_kw, ctx
            )
            results.append(r)
            log(json.dumps(r))
            if plogger is not None:
                plogger.log(args.mode, method=args.method, model=cfg.name, **r)
            with open(out_txt, "a") as f:
                f.write(json.dumps({"method": args.method, **r}) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
