"""Multi-device sharding tests on the virtual 8-CPU-device mesh.

Verifies that the TP/DP-sharded prefill+decode produce bit-identical results to
the single-device run (selection/top-k must not change under sharding —
SURVEY.md §7 'Distributed top-k' hard part)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fastkv_tpu.core.config import (
    EngineConfig,
    Method,
    MethodConfig,
    ModelConfig,
    ParallelConfig,
)
from fastkv_tpu.engine import decode as decode_mod
from fastkv_tpu.engine import prefill as prefill_mod
from fastkv_tpu.models.llama import init_params
from fastkv_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny(num_kv_heads=4, num_heads=8, hidden_size=128,
                           intermediate_size=256)
    mcfg = MethodConfig(
        method=Method.FASTKV, eviction_mode="proportional",
        retain_rate=0.25, tsp_rate=0.5, tsp_idx=1,
    )
    ecfg = EngineConfig(prefill_buckets=(256,), max_new_tokens=8,
                        use_pallas=False, capacity_align=8)
    shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, 256)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 256)), jnp.int32)
    n_true = jnp.array([230, 180], jnp.int32)
    return cfg, mcfg, ecfg, shapes, params, tokens, n_true


def run(cfg, mcfg, ecfg, shapes, params, tokens, n_true):
    logits, cache = jax.jit(
        lambda p, t, n: prefill_mod.prefill(p, cfg, mcfg, ecfg, shapes, t, n)
    )(params, tokens, n_true)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits2, cache2 = jax.jit(
        lambda p, c, tk, pos, slot: decode_mod.decode_step(p, cfg, mcfg, c, tk, pos, slot)
    )(params, cache, tok, n_true, jnp.int32(shapes.prefill_capacity))
    return np.asarray(logits), np.asarray(logits2), cache2


def test_tp_dp_matches_single_device(setup):
    cfg, mcfg, ecfg, shapes, params, tokens, n_true = setup
    ref_logits, ref_logits2, ref_cache = run(
        cfg, mcfg, ecfg, shapes, params, tokens, n_true
    )

    pcfg = ParallelConfig(data=2, model=4)
    mesh = sh.make_mesh(pcfg)
    pspecs = sh.full_param_pspecs(cfg)
    sharded_params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pspecs, is_leaf=lambda x: isinstance(x, P),
    )
    tok_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    n_s = jax.device_put(n_true, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        sh_logits, sh_logits2, sh_cache = run(
            cfg, mcfg, ecfg, shapes, sharded_params, tok_s, n_s
        )

    np.testing.assert_allclose(sh_logits, ref_logits, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(sh_logits2, ref_logits2, atol=2e-4, rtol=1e-4)
    # compressed cache contents identical (selection invariant under sharding)
    np.testing.assert_array_equal(
        np.asarray(sh_cache.valid), np.asarray(ref_cache.valid)
    )
    np.testing.assert_array_equal(np.asarray(sh_cache.pos), np.asarray(ref_cache.pos))


def test_expert_axis_stub_inert(setup):
    """EP mesh-axis stub (SURVEY §2.4: dense Llama/Mistral — stub only): the
    'expert' axis exists in every mesh, no pspec references it, and a mesh
    built with expert=1 alongside real TP/DP produces bit-identical results."""
    cfg, mcfg, ecfg, shapes, params, tokens, n_true = setup
    pcfg = ParallelConfig(data=2, model=4, expert=1)
    assert pcfg.num_devices == 8
    mesh = sh.make_mesh(pcfg)
    assert "expert" in mesh.axis_names and mesh.shape["expert"] == 1
    # no parameter or cache pspec may claim the stub axis for a dense model
    leaves = jax.tree_util.tree_leaves(
        (sh.full_param_pspecs(cfg, quantized=True), sh.cache_pspec(True)),
        is_leaf=lambda x: isinstance(x, P),
    )
    assert all("expert" not in tuple(s) for s in leaves)

    ref_logits, _, _ = run(cfg, mcfg, ecfg, shapes, params, tokens, n_true)
    params_s = sh.shard_params(params, mesh, cfg)
    tok_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    n_s = jax.device_put(n_true, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        logits, _, _ = run(cfg, mcfg, ecfg, shapes, params_s, tok_s, n_s)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4, rtol=1e-4)


def test_shard_params_partial_quant_tree():
    """quantize_params_int8(quantize_embed=False) omits embed/lm_head scale
    leaves; shard_params must mirror the actual tree instead of assuming full
    quantization (pytree structure mismatch otherwise)."""
    from fastkv_tpu.core.quant import quantize_params_int8

    cfg = ModelConfig.tiny(num_kv_heads=4, num_heads=8, hidden_size=128,
                           intermediate_size=256)
    qparams = quantize_params_int8(init_params(cfg, seed=0), quantize_embed=False)
    assert "embed_scale" not in qparams
    mesh = sh.make_mesh(ParallelConfig(data=2, model=4), jax.devices())
    sharded = sh.shard_params(qparams, mesh, cfg)  # must not raise
    assert any(k.endswith("_scale") for k in sharded["layers"])


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tp_quantized_params_match_single_device():
    """int8 weight-only params under TP: shard_params detects the _scale
    leaves, shards them with their weights, and the sharded prefill+decode
    reproduce the single-device int8 run bit-for-bit."""
    from fastkv_tpu.core.quant import quantize_params_int8

    cfg = ModelConfig.tiny(num_kv_heads=4, num_heads=8, hidden_size=128,
                           intermediate_size=256)
    mcfg = MethodConfig(
        method=Method.FASTKV, eviction_mode="proportional",
        retain_rate=0.25, tsp_rate=0.5, tsp_idx=1,
    )
    ecfg = EngineConfig(prefill_buckets=(256,), max_new_tokens=8,
                        use_pallas=False, capacity_align=8)
    shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, 256)
    qparams = quantize_params_int8(init_params(cfg, seed=0))
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 256)), jnp.int32)
    n_true = jnp.array([230, 180], jnp.int32)

    ref_logits, ref_logits2, _ = run(cfg, mcfg, ecfg, shapes, qparams, tokens, n_true)

    mesh = sh.make_mesh(ParallelConfig(data=2, model=4), jax.devices())
    sharded = sh.shard_params(qparams, mesh, cfg)
    assert any(k.endswith("_scale") for k in sharded["layers"])
    tok_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    n_s = jax.device_put(n_true, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        logits, logits2, _ = run(cfg, mcfg, ecfg, shapes, sharded, tok_s, n_s)
    # int8 dequant dots accumulate f32 partials in a different (psum) order
    # under TP — allow reduction-order rounding (measured 3e-7), demand the
    # greedy decisions agree
    np.testing.assert_allclose(logits, ref_logits, atol=1e-5)
    np.testing.assert_allclose(logits2, ref_logits2, atol=1e-5)
    np.testing.assert_array_equal(logits.argmax(-1), ref_logits.argmax(-1))


def test_pp_layer_stage_sharding_matches_single_device(setup):
    """PP (pipe=2) composed with TP+DP: the stacked layer axis of weights AND
    cache shards over 'pipe' (the reference's device_map="auto" equivalent —
    its only multi-device mode, eval/run_longbench.py:311-318). Prefill
    logits, decode logits, and the compressed-cache selection must all match
    the single-device run; the cache must STAY stage-local through prefill
    and the decode step (no full-cache materialization on one stage — the
    70B-loadability requirement)."""
    cfg, mcfg, ecfg, shapes, params, tokens, n_true = setup
    ref_logits, ref_logits2, ref_cache = run(
        cfg, mcfg, ecfg, shapes, params, tokens, n_true
    )

    pcfg = ParallelConfig(data=2, model=2, pipe=2)
    mesh = sh.make_mesh(pcfg)
    params_s = sh.shard_params(params, mesh, cfg)
    assert "pipe" in str(params_s["layers"]["wq"].sharding.spec)
    tok_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    n_s = jax.device_put(n_true, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        logits, cache = jax.jit(
            lambda p, t, n: prefill_mod.prefill(
                p, cfg, mcfg, ecfg, shapes, t, n, pcfg=pcfg, mesh=mesh
            )
        )(params_s, tok_s, n_s)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits2, cache2 = jax.jit(
            lambda p, c, tk, pos, slot: decode_mod.decode_step(
                p, cfg, mcfg, c, tk, pos, slot
            )
        )(params_s, cache, tok, n_s, jnp.int32(shapes.prefill_capacity))

    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logits2), ref_logits2, atol=2e-4, rtol=1e-4)
    # ref_cache is the post-decode-step cache from run(); compare like to like
    np.testing.assert_array_equal(np.asarray(cache2.pos), np.asarray(ref_cache.pos))
    np.testing.assert_array_equal(np.asarray(cache2.valid), np.asarray(ref_cache.valid))
    assert cache.k.sharding.spec[0] == "pipe", cache.k.sharding.spec
    assert cache2.k.sharding.spec[0] == "pipe", cache2.k.sharding.spec
