"""Feasibility demo: Llama-3.1-8B at 128K context on ONE 16 GB v5e — fastkv
only, because fullkv CANNOT fit (the bf16 cache alone is 16.8 GB > HBM; the
largest fullkv-feasible rung is 40960, ROOFLINE.md §8).

FastKV's compressed cache is ~1.8 GB at 131072 (retain 0.1 + tsp), so the 8B
serves the reference's canonical 128K context on a single chip. Reports TTFT
and decode tok/s. Memory is tight (int8 weights 8.04 GB + cache + prefill
transients) — run standalone; a failure here is an OOM data point, not a bug.

Usage: timeout 3000 python scripts/feasibility_8b_128k.py [ctx]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    genlen = 64

    from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, MODEL_PRESETS
    from fastkv_tpu.engine import decode as decode_mod
    from fastkv_tpu.engine import prefill as prefill_mod
    from fastkv_tpu.models.llama import init_params_int8_on_device
    from fastkv_tpu.utils.timing import force, warmup_device

    cfg = MODEL_PRESETS["llama-3.1-8b"](dtype="bfloat16")
    print(f"warmup {warmup_device():.1f}s", file=sys.stderr, flush=True)
    params = init_params_int8_on_device(cfg, seed=0)
    force(params["final_norm"])
    print("8B int8 params resident", file=sys.stderr, flush=True)

    mcfg = MethodConfig(
        method=Method.FASTKV, eviction_mode="proportional", retain_rate=0.1,
        tsp_rate=0.2, tsp_idx=15, window_size=8, kernel_size=7, pooling="maxpool",
    )
    kv_int8 = os.environ.get("FEAS_KV_INT8", "1") == "1"
    ecfg = EngineConfig(
        prefill_buckets=(ctx,), max_new_tokens=genlen, use_pallas=True,
        mlp_chunk=4096,
        # int8 KV halves the compressed cache (~0.9 GB at 131072) — legitimate
        # for a single-method feasibility demo (no fullkv comparison to keep
        # fair), parity-tested in tests/test_quant.py
        kv_int8=kv_int8,
    )
    shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, ctx)
    tokens = jnp.ones((1, ctx), jnp.int32)
    n_true = jnp.array([ctx], jnp.int32)

    pf = jax.jit(lambda p, t, n: prefill_mod.prefill(p, cfg, mcfg, ecfg, shapes, t, n))
    gg = jax.jit(
        lambda p, fl, c, n: decode_mod.greedy_generate(
            p, cfg, mcfg, shapes, fl, c, n, genlen, None, 1
        ),
        donate_argnums=(2,),
    )

    t0 = time.perf_counter()
    logits, cache = pf(params, tokens, n_true)
    force(logits)
    print(f"prefill compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    res, cache2 = gg(params, logits, cache, n_true)
    force(res.tokens)
    print(f"decode compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    del cache2

    pts, dts = [], []
    for _ in range(2):
        t0 = time.perf_counter()
        logits, cache = pf(params, tokens, n_true)
        force(logits)
        pts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        res, cache2 = gg(params, logits, cache, n_true)
        force(res.tokens)
        dts.append(time.perf_counter() - t0)
        del cache2
    cache_gb = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(cache)
    ) / 1e9
    pt, dt = float(np.mean(pts)), float(np.mean(dts))
    print(
        f"FEASIBILITY llama-3.1-8b int8w{'+int8kv' if kv_int8 else ''} fastkv "
        f"ctx={ctx}: TTFT {pt:.2f}s, "
        f"decode {(genlen-1)/dt:.1f} tok/s ({dt/(genlen-1)*1e3:.1f} ms/tok), "
        f"compressed cache {cache_gb:.2f} GB "
        f"(fullkv bf16 cache would be {2*cfg.num_layers*cfg.num_kv_heads*cfg.head_dim*2*ctx/1e9:.1f} GB)",
        flush=True,
    )


if __name__ == "__main__":
    main()
