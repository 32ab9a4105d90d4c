"""Streamed safetensors loading: parity, ranged reads, 70B shape planning.

VERDICT r2 task 5: the loader must never stage the whole checkpoint in host
RAM (jax.make_array_from_callback + safetensors ranged reads), so the
llama-3.1-70b preset becomes loadable on a sharded mesh.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastkv_tpu.core import weights as W
from fastkv_tpu.core.config import (
    EngineConfig, Method, MethodConfig, ModelConfig, ParallelConfig,
)
from fastkv_tpu.models.llama import params_from_hf_state_dict


def _save_tiny(tmp_path, shard_kb=None, seed=0):
    cfg = ModelConfig.tiny()
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False,
    )
    torch.manual_seed(seed)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    kw = {"max_shard_size": f"{shard_kb}KB"} if shard_kb else {}
    model.save_pretrained(str(tmp_path), safe_serialization=True, **kw)
    return cfg, model


def test_streamed_load_matches_state_dict(tmp_path):
    cfg, model = _save_tiny(tmp_path)
    ref = params_from_hf_state_dict(cfg, model.state_dict(), dtype="float32")
    got = W.load_params(str(tmp_path), cfg, dtype="float32")
    flat_ref = jax.tree_util.tree_leaves_with_path(ref)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got))
    for path, leaf in flat_ref:
        np.testing.assert_array_equal(
            np.asarray(flat_got[path]), np.asarray(leaf), err_msg=str(path)
        )


def test_multishard_ranged_reads_under_tp(tmp_path):
    """Multi-shard checkpoint on a TP mesh: every safetensors read must be a
    RANGED block (<= one layer tensor / TP + tolerance), proving the loader
    streams instead of staging whole tensors, and the loaded shards must
    reassemble to the state-dict values."""
    cfg, model = _save_tiny(tmp_path, shard_kb=200)
    assert os.path.exists(os.path.join(tmp_path, "model.safetensors.index.json"))

    from fastkv_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(ParallelConfig(model=4), devices=jax.devices("cpu")[:4])

    reads = []
    orig = W.ShardReader.read

    def spy(self, name, index=()):
        out = orig(self, name, index)
        reads.append((name, out.nbytes))
        return out

    W.ShardReader.read = spy
    try:
        got = W.load_params(str(tmp_path), cfg, mesh=mesh, dtype="float32")
    finally:
        W.ShardReader.read = orig

    # largest single per-layer tensor, fp32
    biggest = max(
        cfg.hidden_size * cfg.intermediate_size,
        cfg.vocab_size * cfg.hidden_size,
    ) * 4
    # sharded leaves must read 1/4 blocks; replicated leaves (embed/norm)
    # read whole tensors once per callback — bound everything by one tensor
    assert max(n for _, n in reads) <= biggest
    sharded_reads = [n for name, n in reads if "gate_proj" in name]
    assert sharded_reads and max(sharded_reads) <= (
        cfg.hidden_size * cfg.intermediate_size * 4
    ) // 4 + 4096, max(sharded_reads)

    ref = params_from_hf_state_dict(cfg, model.state_dict(), dtype="float32")
    np.testing.assert_array_equal(
        np.asarray(got["layers"]["w_gate"]), np.asarray(ref["layers"]["w_gate"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["lm_head"]), np.asarray(ref["lm_head"])
    )


def test_70b_preset_shape_plans_on_mesh():
    """llama-3.1-70b: prefill + decode shape-plan end-to-end (jax.eval_shape —
    no memory allocated) with TP-sharded abstract params on the 8-CPU mesh."""
    from fastkv_tpu.engine import decode as decode_mod
    from fastkv_tpu.engine import prefill as prefill_mod
    from fastkv_tpu.models.llama import param_shapes
    from fastkv_tpu.parallel.sharding import full_param_pspecs

    cfg = ModelConfig.llama_3_1_70b()
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.1, tsp_rate=0.2, tsp_idx=39)
    ecfg = EngineConfig(prefill_buckets=(8192,), max_new_tokens=32)
    shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, 8192)

    flat = {
        k: jax.ShapeDtypeStruct(s, jnp.float32 if ("ln" in k or "norm" in k) else jnp.bfloat16)
        for k, s in param_shapes(cfg).items()
    }
    params = {"layers": {}}
    for k, v in flat.items():
        if k.startswith("layers."):
            params["layers"][k.split(".", 1)[1]] = v
        else:
            params[k] = v
    # spec tree must match the abstract params tree
    specs = full_param_pspecs(cfg)
    jax.tree_util.tree_map(lambda a, b: None, params, specs,
                           is_leaf=lambda x: hasattr(x, "index_count") or isinstance(x, jax.ShapeDtypeStruct))

    tokens = jax.ShapeDtypeStruct((1, 8192), jnp.int32)
    n_true = jax.ShapeDtypeStruct((1,), jnp.int32)
    logits, cache = jax.eval_shape(
        lambda p, t, n: prefill_mod.prefill(p, cfg, mcfg, ecfg, shapes, t, n),
        params, tokens, n_true,
    )
    assert logits.shape == (1, cfg.vocab_size)
    assert cache.k.shape[0] == cfg.num_layers

    tok = jax.ShapeDtypeStruct((1,), jnp.int32)
    out, cache2 = jax.eval_shape(
        lambda p, c, t, pos: decode_mod.decode_step(
            p, cfg, mcfg, c, t, pos, jnp.int32(0)
        ),
        params, cache, tok, n_true,
    )
    assert out.shape == (1, cfg.vocab_size)
    assert cache2.k.shape == cache.k.shape
