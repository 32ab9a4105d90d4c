"""Batched-decode serving throughput: tokens/s/chip vs decode batch size.

New TPU scope beyond the reference (its harness is strictly batch-1,
reference benchmark/e2e.py:55-56): in a serving deployment the decode batch
is the throughput lever, and KV compression is what RAISES the feasible
batch — the compressed cache is ~retain_rate of full, so many more requests
fit in HBM, and each step streams far fewer bytes. This CLI measures exactly
that: tokens/s/chip for fullkv vs fastkv across a batch ladder at a fixed
context.

Protocol (matches the continuous-batching scheduler's execution shape,
engine/scheduler.py: batch-1 prefill admission + shared batched decode):
one batch-1 prefill builds the compressed cache; the cache/logits/lengths
are tiled to batch B (identical per-example content — compute and bytes per
step are identical to B distinct requests of the same length); greedy decode
runs under jit with the cache donated; tok/s = B * (genlen-1) / decode_time.

Each batch size runs the ladder ascending and stops at the first OOM, so the
largest feasible batch is measured, not guessed. Each METHOD runs in its own
subprocess (same isolation as bench.py's context rungs): an OOM at the top of
one method's ladder leaves the device arena unusable for the next method in
the same process (observed: a post-OOM 64 KB allocation fails
RESOURCE_EXHAUSTED). Results land in ROOFLINE.md §7.

Run (real TPU):
    python -m fastkv_tpu.bench.throughput --ctx 16384 --genlen 64
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _tile(tree, b: int):
    """Tile the batch axis (axis 1 for cache leaves, axis 0 for [b, ...])."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, b, axis=1 if x.ndim >= 4 else 0), tree
    )


def run(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="llama-3.2-1b")
    p.add_argument("--ctx", type=int, default=16384)
    p.add_argument("--genlen", type=int, default=64)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--batches", nargs="+", type=int,
                   default=[1, 4, 8, 16, 32, 64])
    p.add_argument("--methods", nargs="+", default=["fullkv", "fastkv"])
    p.add_argument("--retain_rate", type=float, default=0.1)
    p.add_argument("--tsp_rate", type=float, default=0.2)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--no_subprocess", action="store_true",
                   help="run methods in-process (set by the parent)")
    args = p.parse_args(argv)

    if not args.no_subprocess and len(args.methods) > 1:
        # one subprocess per method: a ladder-topping OOM poisons the device
        # arena for everything after it in the same process
        import re
        import subprocess

        peaks = {}
        for method in args.methods:
            cmd = [sys.executable, "-m", "fastkv_tpu.bench.throughput",
                   "--no_subprocess", "--methods", method]
            for flag, val in (("--preset", args.preset), ("--ctx", args.ctx),
                              ("--genlen", args.genlen), ("--runs", args.runs),
                              ("--retain_rate", args.retain_rate),
                              ("--tsp_rate", args.tsp_rate),
                              ("--dtype", args.dtype)):
                cmd += [flag, str(val)]
            cmd += ["--batches"] + [str(b) for b in args.batches]
            r = subprocess.run(cmd, stderr=subprocess.PIPE, timeout=3600)
            err = r.stderr.decode()
            sys.stderr.write(err)
            hits = re.findall(rf"\[{method}\] B=(\d+): (\d+) tok/s", err)
            if hits:
                peaks[method] = max((int(t), int(b)) for b, t in hits)
        if all(m in peaks for m in ("fullkv", "fastkv")):
            (tf, bf), (tk, bk) = peaks["fullkv"], peaks["fastkv"]
            log(f"peak serving throughput ctx={args.ctx}: fullkv {tf} tok/s "
                f"(B={bf}) vs fastkv {tk} tok/s (B={bk}) = {tk/tf:.2f}x")
        return

    from fastkv_tpu.core.config import (
        EngineConfig, Method, MethodConfig, MODEL_PRESETS,
    )
    from fastkv_tpu.engine import decode as decode_mod
    from fastkv_tpu.engine import prefill as prefill_mod
    from fastkv_tpu.models.llama import init_params_on_device
    from fastkv_tpu.utils.timing import force, warmup_device

    cfg = MODEL_PRESETS[args.preset](dtype=args.dtype)
    log(f"device warmup {warmup_device():.1f}s")
    params = init_params_on_device(cfg, seed=0)
    force(params["final_norm"])
    weight_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    )

    results = {}
    for method in args.methods:
        mcfg = MethodConfig(
            method=Method(method), eviction_mode="proportional",
            retain_rate=args.retain_rate, tsp_rate=args.tsp_rate,
            tsp_idx=min(max(1, cfg.num_layers // 2 - 1), cfg.num_layers - 2),
            window_size=8, kernel_size=7, pooling="maxpool",
        )
        ecfg = EngineConfig(prefill_buckets=(args.ctx,),
                            max_new_tokens=args.genlen)
        shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, args.ctx)
        tokens = jnp.ones((1, args.ctx), jnp.int32)
        n1 = jnp.array([args.ctx], jnp.int32)
        pf = jax.jit(
            lambda p, t, n: prefill_mod.prefill(p, cfg, mcfg, ecfg, shapes, t, n)
        )
        logits1, cache1 = pf(params, tokens, n1)
        force(logits1)
        cache_bytes_ex = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(cache1)
        )
        log(f"[{method}] prefilled ctx={args.ctx}; cache/example "
            f"{cache_bytes_ex/1e9:.3f} GB")

        rows = []
        for b in args.batches:
            gg = jax.jit(
                lambda p, fl, c, n: decode_mod.greedy_generate(
                    p, cfg, mcfg, shapes, fl, c, n, args.genlen, None, 1
                ),
                donate_argnums=(2,),
            )
            try:
                # warmup/compile
                res, c2 = gg(params, _tile(logits1, b), _tile(cache1, b),
                             jnp.repeat(n1, b))
                force(res.tokens)
                del c2
                times = []
                for _ in range(args.runs):
                    big = _tile(cache1, b)
                    force(big.k)  # materialize off the clock
                    t0 = time.perf_counter()
                    res, c2 = gg(params, _tile(logits1, b), big,
                                 jnp.repeat(n1, b))
                    force(res.tokens)
                    times.append(time.perf_counter() - t0)
                    del c2
                dt = float(np.mean(times))
                tok_s = b * (args.genlen - 1) / dt
                step_bytes = weight_bytes + b * cache_bytes_ex
                bw = step_bytes * (args.genlen - 1) / dt / 1e9
                rows.append((b, tok_s, dt))
                log(f"[{method}] B={b}: {tok_s:.0f} tok/s "
                    f"({dt*1e3/(args.genlen-1):.2f} ms/step, "
                    f"step bytes {step_bytes/1e9:.2f} GB, "
                    f"implied BW {bw:.0f} GB/s)")
            except Exception as e:
                log(f"[{method}] B={b}: OOM/failure ({type(e).__name__}) — "
                    f"ladder stops")
                break
        results[method] = rows

    if all(m in results and results[m] for m in ("fullkv", "fastkv")):
        best_full = max(t for _, t, _ in results["fullkv"])
        best_fast = max(t for _, t, _ in results["fastkv"])
        log(
            f"peak serving throughput ctx={args.ctx}: fullkv {best_full:.0f} "
            f"tok/s/chip vs fastkv {best_fast:.0f} tok/s/chip "
            f"= {best_fast/best_full:.2f}x"
        )


if __name__ == "__main__":
    run()
