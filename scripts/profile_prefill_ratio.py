"""Diagnose the 131072 prefill-ratio collapse (VERDICT r3 weak #1 / task 2).

Round-3 measured fastkv/fullkv prefill ratio 1.92x at ctx 163840 but only
1.08x at 131072 — adjacent rungs, same code path, unexplained. Hypotheses:
  (a) fastkv segment B's tsp_capacity at 131072 is 26240 (= round_up(0.2*s,
      128)), which is NOT a multiple of the 1024 flash-kernel block — at
      163840 it is exactly 32768. Misaligned segment-B shapes could force
      kernel padding/fallback. Probe: capacity_align=1024 vs 128.
  (b) fullkv at 131072 (a power of two) tiles better than at 163840
      (5 * 2^15), deflating the 131072 ratio from the denominator side.
      Probe: fullkv ms normalized by s^2 across rungs.
  (c) the Pallas flash path specifically: probe use_pallas=0.

Usage (driver TPU):  timeout 3000 python scripts/profile_prefill_ratio.py
Writes one line per config: ctx, method, align, pallas, mean prefill s.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, MODEL_PRESETS
    from fastkv_tpu.engine import prefill as prefill_mod
    from fastkv_tpu.models.llama import init_params_int8_on_device
    from fastkv_tpu.utils.timing import force, warmup_device

    cfg = MODEL_PRESETS["llama-3.2-1b"](dtype="bfloat16")
    print(f"warmup {warmup_device():.1f}s", file=sys.stderr, flush=True)
    params = init_params_int8_on_device(cfg, seed=0)
    force(params["final_norm"])

    def run(method, ctx, align=128, pallas=True, runs=2):
        mcfg = MethodConfig(
            method=Method(method), eviction_mode="proportional", retain_rate=0.1,
            tsp_rate=0.2, tsp_idx=cfg.num_layers // 2 - 1, window_size=8,
            kernel_size=7, pooling="maxpool",
        )
        ecfg = EngineConfig(
            prefill_buckets=(ctx,), max_new_tokens=128, use_pallas=pallas,
            capacity_align=align,
        )
        shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, ctx)
        tokens = jnp.ones((1, ctx), jnp.int32)
        n_true = jnp.array([ctx], jnp.int32)
        pf = jax.jit(
            lambda p, t, n: prefill_mod.prefill(p, cfg, mcfg, ecfg, shapes, t, n)
        )
        t0 = time.perf_counter()
        logits, cache = pf(params, tokens, n_true)
        force(logits)
        compile_s = time.perf_counter() - t0
        del cache
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            logits, cache = pf(params, tokens, n_true)
            force(logits)
            ts.append(time.perf_counter() - t0)
            del cache
        mean = float(np.mean(ts))
        print(
            f"ctx={ctx} method={method} align={align} pallas={int(pallas)} "
            f"tsp_cap={shapes.tsp_capacity} prefill_s={mean:.3f} "
            f"(runs={[f'{x:.3f}' for x in ts]}, compile={compile_s:.1f}s) "
            f"norm_ms_per_Mtok2={mean*1e3/ (ctx/2**20)**2:.1f}",
            flush=True,
        )
        return mean

    import os

    res = {}
    for ctx in (131072, 163840):
        res[("fullkv", ctx)] = run("fullkv", ctx)
        res[("fastkv", ctx)] = run("fastkv", ctx)
    if os.environ.get("PROFILE_ALIGN") == "1":
        # hypothesis (a): 1024-aligned tsp capacity at 131072 (tested round 4:
        # 11.752s vs 11.758s — alignment is irrelevant)
        res[("fastkv_a1024", 131072)] = run("fastkv", 131072, align=1024)
        print(
            f"ratio ctx=131072 align1024: "
            f"{res[('fullkv', 131072)] / res[('fastkv_a1024', 131072)]:.2f}x",
            flush=True,
        )
    if os.environ.get("PROFILE_NOPALLAS") == "1":
        # WARNING: the pure-XLA chunked attention at 131072 materializes fp32
        # logit blocks that HARD-OOM the v5e and KILL the TPU worker process
        # (observed round 4) — opt-in only, run nothing after it.
        res[("fastkv_noplls", 131072)] = run("fastkv", 131072, pallas=False)
        res[("fullkv_noplls", 131072)] = run("fullkv", 131072, pallas=False)
        print(
            f"ratio ctx=131072 noPallas: "
            f"{res[('fullkv_noplls', 131072)] / res[('fastkv_noplls', 131072)]:.2f}x",
            flush=True,
        )

    for ctx in (131072, 163840):
        r = res[("fullkv", ctx)] / res[("fastkv", ctx)]
        print(f"ratio ctx={ctx}: {r:.2f}x", flush=True)


if __name__ == "__main__":
    main()
