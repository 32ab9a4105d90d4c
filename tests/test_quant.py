"""Int8 quantization parity: weight-only matmul quant and the int8 KV cache.

Quantization is new TPU scope (no reference counterpart); the guardrails are
numeric: absmax round-trip error bounds, logit-drift bounds vs the unquantized
engine, and end-to-end generation through the same Engine/Scheduler paths.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fastkv_tpu.cache.kv_cache import KVCache
from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.core.quant import absmax_quantize, quantize_kv, quantize_params_int8
from fastkv_tpu.engine import decode as decode_mod
from fastkv_tpu.engine import prefill as prefill_mod
from fastkv_tpu.engine.generate import Engine
from fastkv_tpu.models.llama import init_params


def test_absmax_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, 64, 32)), jnp.float32)
    wi, s = absmax_quantize(w, axis=1)
    assert wi.dtype == jnp.int8 and s.shape == (4, 1, 32)
    err = np.abs(np.asarray(wi, np.float32) * np.asarray(s) - np.asarray(w))
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_quantize_params_structure():
    cfg = ModelConfig.tiny()
    params = quantize_params_int8(init_params(cfg, seed=0))
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        assert params["layers"][name].dtype == jnp.int8
        assert params["layers"][name + "_scale"].dtype == jnp.float32
    assert params["embed"].dtype == jnp.int8
    # tiny is untied
    assert params["lm_head"].dtype == jnp.int8


def _prefill_logits(cfg, params, mcfg, tokens, n_true, **ecfg_kw):
    ecfg = EngineConfig(prefill_buckets=(tokens.shape[1],), max_new_tokens=8,
                        use_pallas=False, capacity_align=8, **ecfg_kw)
    shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, tokens.shape[1])
    return prefill_mod.prefill(params, cfg, mcfg, ecfg, shapes, tokens, n_true)


def test_int8_weights_logit_drift_bounded():
    """Weight-only int8: prefill logits stay close to fp32 (tiny 4-layer)."""
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 256)), jnp.int32)
    n_true = jnp.array([200], jnp.int32)
    mcfg = MethodConfig(method=Method.FULLKV)
    ref, _ = _prefill_logits(cfg, params, mcfg, tokens, n_true)
    qlogits, _ = _prefill_logits(
        cfg, quantize_params_int8(params), mcfg, tokens, n_true
    )
    ref, qlogits = np.asarray(ref), np.asarray(qlogits)
    drift = np.abs(qlogits - ref).max()
    spread = ref.std()
    assert drift < 0.15 * spread, (drift, spread)
    # greedy decision preserved on a clear-margin winner
    assert np.argmax(qlogits[0]) == np.argmax(ref[0])


def test_int8_kv_decode_logit_drift():
    """int8 KV cache: one decode step's logits drift < 1e-2 vs the bf16 cache
    (VERDICT r2 task 3 bar). Scales are folded into the attention math."""
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(method=Method.FULLKV)
    rng = np.random.default_rng(2)
    L, b, kh, cap, d = cfg.num_layers, 1, cfg.num_kv_heads, 64, cfg.head_dim
    kept = 50
    k = jnp.asarray(rng.standard_normal((L, b, kh, cap, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, b, kh, cap, d)), jnp.float32)
    valid = jnp.broadcast_to((jnp.arange(cap) < kept)[None, None, None], (L, b, kh, cap))
    k = jnp.where(valid[..., None], k, 0)
    v = jnp.where(valid[..., None], v, 0)
    pos = jnp.broadcast_to(jnp.arange(cap)[None, None, None], (L, b, kh, cap)).astype(jnp.int32)
    pos = jnp.where(valid, pos, 0)
    cache = KVCache(k=k, v=v, pos=pos, valid=valid)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    qcache = KVCache(k=kq, v=vq, pos=pos, valid=valid, k_scale=ks, v_scale=vs)

    tok = jnp.array([7], jnp.int32)
    cur = jnp.array([kept], jnp.int32)
    slot = jnp.int32(kept)
    ref, _ = decode_mod.decode_step(params, cfg, mcfg, cache, tok, cur, slot)
    out, ncache = decode_mod.decode_step(params, cfg, mcfg, qcache, tok, cur, slot)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-2
    # the appended token was quantized on write
    assert ncache.k.dtype == jnp.int8
    assert bool(ncache.valid[0, 0, 0, slot])


def test_engine_kv_int8_end_to_end():
    """FastKV + int8 KV through the Engine: first token matches the bf16-cache
    run exactly (prefill attention is unquantized) and decode stays aligned
    for several steps on a tiny model."""
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, cfg.vocab_size, size=300).tolist()
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.3, tsp_rate=0.5, tsp_idx=1)

    def gen(kv_int8):
        ecfg = EngineConfig(prefill_buckets=(512,), max_new_tokens=16,
                            use_pallas=False, capacity_align=8, kv_int8=kv_int8)
        return Engine(params, cfg, mcfg, ecfg).generate([prompt], max_new_tokens=12)[0]

    ref = gen(False)
    out = gen(True)
    assert out[0] == ref[0]
    # int8 KV drift may flip late low-margin picks; demand a shared prefix
    shared = sum(1 for a, b in zip(ref, out) if a == b)
    assert shared >= 6, (ref, out)


def test_scheduler_kv_int8():
    """Continuous-batching scheduler with the int8 cache completes requests and
    matches the unquantized scheduler's first tokens."""
    from fastkv_tpu.engine.scheduler import Scheduler

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.3, tsp_rate=0.5, tsp_idx=1)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, cfg.vocab_size, size=n).tolist() for n in (60, 100)]

    def run(kv_int8):
        ecfg = EngineConfig(prefill_buckets=(128,), use_pallas=False,
                            capacity_align=8, kv_int8=kv_int8)
        s = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=128,
                      max_new_tokens=8)
        for p in prompts:
            s.submit(p)
        return {r.req_id: r.tokens for r in s.run()}

    ref = run(False)
    out = run(True)
    assert set(out) == set(ref)
    for rid in ref:
        assert out[rid][0] == ref[rid][0]
        assert len(out[rid]) == len(ref[rid])


def test_init_params_int8_on_device_matches_quantized_tree():
    """The direct int8 initializer (models.llama.init_params_int8_on_device,
    used by bench.py for models whose bf16 weights exceed HBM) must produce a
    pytree with the same structure/shapes/dtypes as init-then-quantize, and a
    runnable forward."""
    from fastkv_tpu.models.llama import init_params_int8_on_device

    cfg = ModelConfig.tiny(num_layers=2)
    ref = quantize_params_int8(init_params(cfg, seed=0))
    direct = init_params_int8_on_device(cfg, seed=0)
    ref_s = jax.tree_util.tree_structure(ref)
    dir_s = jax.tree_util.tree_structure(direct)
    assert ref_s == dir_s
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref),
        jax.tree_util.tree_leaves_with_path(direct),
    ):
        assert a.shape == b.shape, kp
        assert a.dtype == b.dtype, kp

    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.25, tsp_rate=0.5, tsp_idx=0)
    ecfg = EngineConfig(prefill_buckets=(64,), max_new_tokens=4,
                        use_pallas=False, capacity_align=8)
    shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, 64)
    tokens = jnp.ones((1, 64), jnp.int32)
    logits, _ = jax.jit(
        lambda p, t, n: prefill_mod.prefill(p, cfg, mcfg, ecfg, shapes, t, n)
    )(direct, tokens, jnp.array([64], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()
