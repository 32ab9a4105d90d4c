"""Mistral family correctness: sliding-window attention parity vs HuggingFace
transformers, and the reference's index-based SWA cache-slice semantics for
compressed caches (reference: baselines/fastkv/mistral_model.py:72-98).
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine.generate import Engine
from fastkv_tpu.models.llama import params_from_hf_state_dict

SLIDING_WINDOW = 48  # far smaller than the prompt so SWA actually engages


def make_hf_tiny_mistral(seed=0):
    cfg = ModelConfig.tiny(sliding_window=SLIDING_WINDOW)
    hf_cfg = transformers.MistralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        sliding_window=SLIDING_WINDOW,
        tie_word_embeddings=False,
        use_cache=True,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    model = transformers.MistralForCausalLM(hf_cfg).eval()
    return cfg, model


@pytest.fixture(scope="module")
def tiny_pair():
    cfg, hf_model = make_hf_tiny_mistral()
    params = params_from_hf_state_dict(cfg, hf_model.state_dict(), dtype="float32")
    return cfg, hf_model, params


def fullkv_engine(cfg, params, bucket=256, max_new=16):
    mcfg = MethodConfig(method=Method.FULLKV)
    ecfg = EngineConfig(
        prefill_buckets=(bucket,), max_new_tokens=max_new, use_pallas=False,
        capacity_align=8,
    )
    return Engine(params, cfg, mcfg, ecfg)


def test_swa_prefill_logits_match_hf(tiny_pair):
    """Prompt 3x the window: SWA masking must match HF MistralModel."""
    cfg, hf_model, params = tiny_pair
    rng = np.random.default_rng(1)
    n = 150
    ids = rng.integers(0, cfg.vocab_size, size=(1, n))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits[0, -1].float().numpy()
    eng = fullkv_engine(cfg, params)
    toks = np.zeros((1, 256), np.int32)
    toks[0, :n] = ids[0]
    logits, _ = eng.prefill_fn(256, 16)(params, toks, np.array([n], np.int32))
    np.testing.assert_allclose(np.asarray(logits)[0], hf_logits, atol=2e-3, rtol=1e-3)


def test_swa_greedy_generate_matches_hf(tiny_pair):
    """Greedy decode past the window edge: decode steps attend to the last
    `sliding_window` cache entries, matching HF's position mask (for a full
    cache, entry index == position, so both semantics must agree)."""
    cfg, hf_model, params = tiny_pair
    rng = np.random.default_rng(2)
    for n, mn in [(150, 16), (40, 12)]:
        ids = rng.integers(0, cfg.vocab_size, size=(1, n))
        with torch.no_grad():
            out = hf_model.generate(
                torch.tensor(ids), max_new_tokens=mn, do_sample=False,
                num_beams=1, pad_token_id=0,
            )
        hf_new = out[0, n:].tolist()
        ours = fullkv_engine(cfg, params).generate([ids[0].tolist()], max_new_tokens=mn)[0]
        assert ours == hf_new, f"n={n}: {ours} != {hf_new}"


def test_compressed_cache_swa_is_index_based(tiny_pair):
    """Reference semantics: the SWA slice drops the OLDEST CACHE ENTRIES, not
    old positions (mistral_model.py:81-85 slices past_key[:, :, 1-window:]).
    A compressed cache shorter than the window must keep far-past selected
    tokens fully visible during decode."""
    from fastkv_tpu.cache.kv_cache import KVCache
    from fastkv_tpu.engine import decode as decode_mod

    cfg, _, params = tiny_pair
    mcfg = MethodConfig(method=Method.FULLKV)
    rng = np.random.default_rng(5)
    b, kh, d, cap, kept = 1, cfg.num_kv_heads, cfg.head_dim, 32, 10
    L = cfg.num_layers

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    k = jnp.where(
        (jnp.arange(cap) < kept)[None, None, :, None], mk((b, kh, cap, d)), 0.0
    )
    v = jnp.where(
        (jnp.arange(cap) < kept)[None, None, :, None], mk((b, kh, cap, d)), 0.0
    )
    # kept entries carry positions 0..9; the current token decodes at
    # position 1000 — position-distance >> window, entry-count << window
    pos = jnp.where(jnp.arange(cap) < kept, jnp.arange(cap), 0)[None, None, :]
    valid = (jnp.arange(cap) < kept)[None, None, :]
    cache = KVCache(
        k=jnp.broadcast_to(k[None], (L, b, kh, cap, d)),
        v=jnp.broadcast_to(v[None], (L, b, kh, cap, d)),
        pos=jnp.broadcast_to(pos[None], (L, b, kh, cap)).astype(jnp.int32),
        valid=jnp.broadcast_to(valid[None], (L, b, kh, cap)),
    )
    tok = jnp.array([7], jnp.int32)
    cur = jnp.array([1000], jnp.int32)
    slot = jnp.int32(kept)

    logits_swa, _ = decode_mod.decode_step(params, cfg, mcfg, cache, tok, cur, slot)

    cfg_noswa = ModelConfig.tiny(sliding_window=None)
    logits_free, _ = decode_mod.decode_step(
        params, cfg_noswa, mcfg, cache, tok, cur, slot
    )
    # 11 entries total < window 48: nothing may be masked
    np.testing.assert_allclose(
        np.asarray(logits_swa), np.asarray(logits_free), atol=1e-5, rtol=1e-5
    )


def test_fastkv_mistral_fused_pallas_matches_xla(tiny_pair):
    """FastKV + sliding window with the FUSED Pallas scoring path (interpret
    mode) must reproduce the XLA path bit-for-bit on keep-sets. Regression
    test: the fused branch must mask by layout-index distance
    (_mask_positions), not raw original positions — post-TSP layers carry
    non-contiguous positions whose pairwise distance exceeds the window even
    for adjacent cache entries."""
    from jax.experimental.pallas import tpu as pltpu

    from fastkv_tpu.engine import prefill as prefill_mod

    cfg, _, params = tiny_pair
    rng = np.random.default_rng(13)
    n = 150  # 3x the window, so SWA engages pre-TSP too
    tokens = np.zeros((1, 256), np.int32)
    tokens[0, :n] = rng.integers(0, cfg.vocab_size, size=n)
    tokens = jnp.asarray(tokens)
    n_true = jnp.array([n], jnp.int32)
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.3, tsp_rate=0.5, tsp_idx=1, window_size=8)

    def run(use_pallas):
        ecfg = EngineConfig(prefill_buckets=(256,), max_new_tokens=8,
                            use_pallas=use_pallas, capacity_align=8)
        shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, 256)
        return prefill_mod.prefill(params, cfg, mcfg, ecfg, shapes, tokens, n_true)

    ref_logits, ref_cache = run(False)
    with pltpu.force_tpu_interpret_mode():
        logits, cache = run(True)
    np.testing.assert_array_equal(np.asarray(cache.pos), np.asarray(ref_cache.pos))
    np.testing.assert_array_equal(np.asarray(cache.valid), np.asarray(ref_cache.valid))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )


def test_fastkv_mistral_generates(tiny_pair):
    """FastKV + TSP on the Mistral config: end-to-end generation runs and the
    first token (exact prefill attention) matches fullkv."""
    cfg, _, params = tiny_pair
    rng = np.random.default_rng(9)
    prompt = rng.integers(0, cfg.vocab_size, size=150).tolist()
    full = fullkv_engine(cfg, params).generate([prompt], max_new_tokens=8)[0]
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.3, tsp_rate=0.5, tsp_idx=1)
    ecfg = EngineConfig(prefill_buckets=(256,), max_new_tokens=8,
                        use_pallas=False, capacity_align=8)
    fast = Engine(params, cfg, mcfg, ecfg).generate([prompt], max_new_tokens=8)[0]
    assert fast[0] == full[0]
    assert len(fast) == 8
