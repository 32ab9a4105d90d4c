"""Mesh construction and sharding rules (DP / TP / SP axes).

The reference is strictly single-GPU (every script pins CUDA_VISIBLE_DEVICES=0,
e.g. scripts/eval_longbench.sh:12; its only multi-device mechanism is HF
device_map layer splitting). This subsystem is new TPU scope per BASELINE.json:
weights and the compressed KV cache are tensor-sharded over ICI with XLA
collectives inserted by the SPMD partitioner — no NCCL analog needed.

Axis semantics:
  data  — batch (DP replicas; the continuous-batching scheduler assigns
          requests across this axis)
  model — TP: attention heads / MLP hidden / vocab; the compressed cache
          shards on its cache-head axis (kv heads, <= num_kv_heads ways, or
          query heads for the per-head SnapKV/H2O layout)
  seq   — SP for long prefill (ring attention / Ulysses; see
          fastkv_tpu.parallel.ring_attention)

TSP under TP: per-kv-head scores live on the model axis; the kv-head sum for
TSP selection (fastkv/utils.py:127) becomes a psum the partitioner inserts
automatically from the sharding annotations, after which the top-k runs
replicated — selection is bit-identical to single-chip.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastkv_tpu.core.config import ModelConfig, ParallelConfig

# 'expert' is the EP stub (SURVEY §2.4: dense Llama/Mistral — "leave a mesh
# axis stub only"). No pspec in this module references it; at size 1 it is
# inert (tests/test_sharding.py asserts sharded results are bit-identical).
AXES = ("data", "model", "seq", "pipe", "expert")


def make_mesh(pcfg: ParallelConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = pcfg.num_devices
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(
        pcfg.data, pcfg.model, pcfg.seq, pcfg.pipe, pcfg.expert
    )
    return Mesh(arr, AXES)


def param_pspecs(cfg: ModelConfig) -> Dict[str, Any]:
    """PartitionSpecs matching the fastkv_tpu.models.llama params pytree.

    Megatron-style TP: column-parallel qkv/gate/up, row-parallel o/down (the
    partitioner inserts the psum after row-parallel contractions); vocab-
    parallel embedding and LM head.

    PP (pipe > 1): the stacked [L, ...] layer axis additionally shards over
    'pipe' — layer-stage sharding, the TPU equivalent of the reference's
    device_map="auto" layer splitting (its only multi-device mode,
    eval/run_longbench.py:311-318). Each stage holds L/pipe layers' weights
    (and cache, cache_pspec); the SPMD partitioner moves the [b, s, D] hidden
    state between stages at segment boundaries. Correctness is mesh-shape
    independent (tests/test_sharding.py); with pipe=1 the axis is inert.
    Microbatch pipelining (bubble hiding) is intentionally NOT done — at
    inference the stage hand-off is one activation ppermute per stage, and
    decode latency is additive in stages either way."""
    specs = {
        # Replicated: token gather from a vocab-sharded table makes XLA
        # materialize cross-shard gathers; the table is small relative to HBM
        # (1-2 GB bf16 at 128k vocab). Vocab-parallel unembed still happens via
        # lm_head below.
        "embed": P(),
        "final_norm": P(),
        "layers": {
            "wq": P("pipe", None, "model"),
            "wk": P("pipe", None, "model"),
            "wv": P("pipe", None, "model"),
            "wo": P("pipe", "model", None),
            "w_gate": P("pipe", None, "model"),
            "w_up": P("pipe", None, "model"),
            "w_down": P("pipe", "model", None),
            "ln_attn": P("pipe"),
            "ln_mlp": P("pipe"),
        },
    }
    return specs


def lm_head_pspec() -> P:
    return P(None, "model")


def full_param_pspecs(
    cfg: ModelConfig, tie: Optional[bool] = None, quantized: bool = False
) -> Dict[str, Any]:
    """With quantized=True, include the int8 `<name>_scale` leaves
    (core.quant): per-output-channel scales shard like the weight's output
    axis — column-parallel scales on 'model', row-parallel replicated."""
    specs = param_pspecs(cfg)
    if quantized:
        lay = specs["layers"]
        for name in ("wq", "wk", "wv", "w_gate", "w_up"):
            lay[name + "_scale"] = P("pipe", None, "model")
        for name in ("wo", "w_down"):
            lay[name + "_scale"] = P("pipe")
        specs["embed_scale"] = P()
    if not (cfg.tie_word_embeddings if tie is None else tie):
        specs["lm_head"] = lm_head_pspec()
        if quantized:
            specs["lm_head_scale"] = P(None, "model")
    return specs


def cache_pspec(quantized: bool = False) -> Any:
    """KVCache sharding: layer axis on pipe (stage-local cache), batch on
    data, cache heads on model."""
    from fastkv_tpu.cache.kv_cache import KVCache

    scale = P("pipe", "data", "model", None) if quantized else None
    return KVCache(
        k=P("pipe", "data", "model", None, None),
        v=P("pipe", "data", "model", None, None),
        pos=P("pipe", "data", "model", None),
        valid=P("pipe", "data", "model", None),
        k_scale=scale,
        v_scale=scale,
    )


def tokens_pspec() -> P:
    return P("data", None)


def batch_pspec() -> P:
    return P("data")


def logits_pspec() -> P:
    return P("data", "model")


def shard_params(params: Dict[str, Any], mesh: Mesh, cfg: ModelConfig) -> Dict[str, Any]:
    """device_put the params pytree onto the mesh per the TP rules.

    Detects int8-quantized params (core.quant adds `_scale` siblings) and
    shards the scale planes consistently with their weights."""
    quantized = any(k.endswith("_scale") for k in params.get("layers", {}))
    specs = full_param_pspecs(
        cfg, tie="lm_head" not in params, quantized=quantized
    )
    # quantize_params_int8(quantize_embed=False) omits the embed/lm_head scale
    # leaves even when layer scales exist — mirror the actual tree, or
    # tree_map fails on a pytree structure mismatch.
    for opt in ("embed_scale", "lm_head_scale"):
        if opt in specs and opt not in params:
            del specs[opt]
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def named(mesh: Mesh, spec) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec, is_leaf=lambda x: isinstance(x, P)
    )
