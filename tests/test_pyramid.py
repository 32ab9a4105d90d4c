"""PyramidInfer tests: schedule math, pyramid shape plan, and e2e generation."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine import pyramid
from fastkv_tpu.engine.generate import Engine
from fastkv_tpu.models.llama import init_params


def test_decay_schedule_matches_reference_formulas():
    mcfg = MethodConfig(method=Method.PYRAMIDINFER, pyramid_decay_ratio=0.3,
                        pyramid_decay_strategy="cosine")
    L = 32
    for l in [0, 7, 31]:
        expect = (1.0 - 0.3) * (math.cos(math.pi * l / L) + 1) / 2 + 0.3
        assert pyramid.decay_ratio(mcfg, l, L) == pytest.approx(expect)
    mlin = MethodConfig(method=Method.PYRAMIDINFER, pyramid_decay_ratio=0.3,
                        pyramid_decay_strategy="linear")
    assert pyramid.decay_ratio(mlin, 16, 32) == pytest.approx((1 - 0.3) * 0.5 + 0.3)


def test_layer_lengths_monotone_pyramid():
    cfg = ModelConfig.tiny(num_layers=8)
    mcfg = MethodConfig(method=Method.PYRAMIDINFER, pyramid_decay_ratio=0.3,
                        pyramid_recent_ratio=0.1, pyramid_min_context_length=16)
    lengths = pyramid.plan_layer_lengths(cfg, mcfg, 1024, align=8)
    assert lengths[0] == 1024
    assert all(b <= a for a, b in zip(lengths, lengths[1:]))
    assert lengths[-1] < 1024  # actually compressed


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(
        method=Method.PYRAMIDINFER,
        pyramid_decay_ratio=0.4, pyramid_recent_ratio=0.1,
        pyramid_min_context_length=8, pyramid_sink_len=4,
        pyramid_distance_weight=1.2,
    )
    ecfg = EngineConfig(prefill_buckets=(256,), max_new_tokens=8,
                        use_pallas=False, capacity_align=8)
    return Engine(params, cfg, mcfg, ecfg), cfg


def test_pyramid_generates_and_cache_shrinks(tiny_engine):
    eng, cfg = tiny_engine
    prompt = list(np.random.default_rng(3).integers(0, cfg.vocab_size, 250))
    import jax

    fn = eng.prefill_fn(256, 8)
    toks = np.zeros((1, 256), np.int32)
    toks[0, :250] = prompt
    logits, cache = fn(eng.params, jnp.asarray(toks), jnp.array([250], jnp.int32))
    counts = np.asarray(cache.valid).sum(axis=(2, 3)) / cache.valid.shape[2]
    # per-layer cache contents form a (weakly) decreasing pyramid
    assert counts[0, 0] == 250
    assert counts[-1, 0] < counts[0, 0]
    assert all(b <= a + 1e-6 for a, b in zip(counts[:, 0], counts[1:, 0]))

    out = eng.generate([prompt], max_new_tokens=6)[0]
    assert len(out) == 6


def test_pyramid_sinks_survive(tiny_engine):
    eng, cfg = tiny_engine
    prompt = list(np.random.default_rng(4).integers(0, cfg.vocab_size, 250))
    fn = eng.prefill_fn(256, 8)
    toks = np.zeros((1, 256), np.int32)
    toks[0, :250] = prompt
    _, cache = fn(eng.params, jnp.asarray(toks), jnp.array([250], jnp.int32))
    pos = np.asarray(cache.pos)
    val = np.asarray(cache.valid)
    last = cfg.num_layers - 1
    kept_positions = set(pos[last, 0, 0][val[last, 0, 0]].tolist())
    assert {0, 1, 2, 3} <= kept_positions  # sink tokens pinned through the pyramid
    assert 249 in kept_positions  # most recent token survives
