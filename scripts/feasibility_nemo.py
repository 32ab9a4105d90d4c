"""Feasibility: Mistral-Nemo-12B beyond its fullkv ceiling on ONE 16 GB v5e.

The third model of the reference's zoo (reference scripts2/eval_prefill.sh:53-66,
canonical tsp_idx=19; README.md:53-56). Int8 weights are ~12.2 GB, so the
fullkv bf16 cache (160 KB/token, 40 layers * 8 kv heads * 128 d) caps the
fullkv-feasible context near 16K on one chip: at 32768 the cache alone is
5.4 GB and prefill transients push past the 15.75 GB arena. FastKV's
compressed cache (retain 0.1) runs multiples of that — this script measures
the fastkv-only row (TTFT + decode tok/s + cache bytes) at a context fullkv
cannot reach, mirroring scripts/feasibility_8b_128k.py.

Usage: timeout 3000 python scripts/feasibility_nemo.py [ctx]   (default 32768)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    genlen = 64

    from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, MODEL_PRESETS
    from fastkv_tpu.engine import decode as decode_mod
    from fastkv_tpu.engine import prefill as prefill_mod
    from fastkv_tpu.models.llama import init_params_int8_on_device
    from fastkv_tpu.utils.timing import force, warmup_device

    cfg = MODEL_PRESETS["mistral-nemo-12b"](dtype="bfloat16")
    print(f"warmup {warmup_device():.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    params = init_params_int8_on_device(cfg, seed=0)
    force(params["final_norm"])
    wbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree_util.tree_leaves(params))
    print(f"12B int8 params resident ({wbytes/1e9:.2f} GB, "
          f"{time.perf_counter()-t0:.1f}s)", file=sys.stderr, flush=True)

    mcfg = MethodConfig(
        method=Method.FASTKV, eviction_mode="proportional", retain_rate=0.1,
        tsp_rate=0.2, tsp_idx=19,  # reference's canonical Nemo operating point
        window_size=8, kernel_size=7, pooling="maxpool",
    )
    ecfg = EngineConfig(
        prefill_buckets=(ctx,), max_new_tokens=genlen, use_pallas=True,
        mlp_chunk=8192,
        kv_int8=os.environ.get("FEAS_KV_INT8", "0") == "1",
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
    print(f"prefill compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    cache_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree_util.tree_leaves(cache))
    res, cache2 = gg(params, logits, cache, n_true)
    force(res.tokens)
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
    pt, dt = float(np.mean(pts)), float(np.mean(dts))
    tok_s = (genlen - 1) / dt
    step_bytes = wbytes + cache_bytes
    fullkv_cache = ctx * 2 * cfg.num_layers * cfg.num_kv_heads * cfg.head_dim * 2
    print(
        f"nemo-12b fastkv ctx={ctx}: TTFT {pt:.1f}s, decode {tok_s:.1f} tok/s "
        f"({dt*1e3/(genlen-1):.1f} ms/tok, implied BW "
        f"{step_bytes*(genlen-1)/dt/1e9:.0f} GB/s), compressed cache "
        f"{cache_bytes/1e9:.2f} GB (fullkv bf16 cache would be "
        f"{fullkv_cache/1e9:.2f} GB on top of {wbytes/1e9:.1f} GB weights)",
        flush=True,
    )


if __name__ == "__main__":
    main()
