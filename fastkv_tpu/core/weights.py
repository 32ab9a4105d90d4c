"""Weight loading: local HF checkpoint dir (safetensors) -> stacked param pytree.

The reference loads weights through transformers' from_pretrained
(reference: eval/run_longbench.py:311-318); here safetensors shards are read
directly and placed per-leaf onto the mesh sharding (no torch in the load path).
Works fully offline given a local model directory with config.json +
*.safetensors (+ optional index json).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastkv_tpu.core.config import ModelConfig


def load_hf_config(model_dir: str) -> Dict[str, Any]:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


def model_config_from_dir(model_dir: str, name: Optional[str] = None, dtype: str = "bfloat16") -> ModelConfig:
    hf = load_hf_config(model_dir)
    import dataclasses

    cfg = ModelConfig.from_hf_config(hf, name=name or os.path.basename(model_dir.rstrip("/")))
    return dataclasses.replace(cfg, dtype=dtype)


def _open_shards(model_dir: str):
    """Yield (tensor_name -> loader) across all safetensors shards."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            weight_map = json.load(f)["weight_map"]
        by_shard: Dict[str, list] = {}
        for name, shard in weight_map.items():
            by_shard.setdefault(shard, []).append(name)
        for shard, names in by_shard.items():
            with safe_open(os.path.join(model_dir, shard), framework="np") as f:
                for n in names:
                    yield n, f.get_tensor(n)
    else:
        single = os.path.join(model_dir, "model.safetensors")
        with safe_open(single, framework="np") as f:
            for n in f.keys():
                yield n, f.get_tensor(n)


_LAYER_MAP = {
    "self_attn.q_proj.weight": "wq",
    "self_attn.k_proj.weight": "wk",
    "self_attn.v_proj.weight": "wv",
    "self_attn.o_proj.weight": "wo",
    "mlp.gate_proj.weight": "w_gate",
    "mlp.up_proj.weight": "w_up",
    "mlp.down_proj.weight": "w_down",
    "input_layernorm.weight": "ln_attn",
    "post_attention_layernorm.weight": "ln_mlp",
}


def load_params(
    model_dir: str,
    cfg: ModelConfig,
    mesh=None,
    dtype=None,
) -> Dict[str, Any]:
    """Load and convert weights. With a mesh, leaves are placed per the TP specs."""
    dtype = jnp.dtype(dtype or cfg.dtype)
    L = cfg.num_layers

    staging: Dict[str, list] = {k: [None] * L for k in _LAYER_MAP.values()}
    top: Dict[str, Any] = {}

    def to_np(t):
        if t.dtype == np.dtype("V2") or str(t.dtype) == "bfloat16":  # raw bf16
            return t
        return t

    for name, tensor in _open_shards(model_dir):
        tensor = to_np(tensor)
        if name == "model.embed_tokens.weight":
            top["embed"] = tensor
        elif name == "model.norm.weight":
            top["final_norm"] = tensor
        elif name == "lm_head.weight":
            top["lm_head"] = tensor
        elif name.startswith("model.layers."):
            parts = name.split(".", 3)
            layer_idx = int(parts[2])
            suffix = parts[3]
            key = _LAYER_MAP.get(suffix)
            if key is not None:
                staging[key][layer_idx] = tensor

    def norm_cast(x):
        return jnp.asarray(np.asarray(x, np.float32), jnp.float32)

    def w_cast(x, transpose=True):
        arr = np.asarray(x)
        if transpose:
            arr = arr.T  # HF Linear stores [out, in]; we compute x @ W
        return jnp.asarray(arr.astype(np.float32), dtype)

    params: Dict[str, Any] = {
        "embed": jnp.asarray(np.asarray(top["embed"], np.float32), dtype),
        "final_norm": norm_cast(top["final_norm"]),
        "layers": {},
    }
    for key, tensors in staging.items():
        missing = [i for i, t in enumerate(tensors) if t is None]
        if missing:
            raise ValueError(f"missing layer tensors for {key}: layers {missing}")
        if key.startswith("ln_"):
            params["layers"][key] = jnp.stack([norm_cast(t) for t in tensors])
        else:
            params["layers"][key] = jnp.stack([w_cast(t) for t in tensors])
    if not cfg.tie_word_embeddings:
        if "lm_head" not in top:
            raise ValueError("config says untied embeddings but no lm_head found")
        params["lm_head"] = w_cast(top["lm_head"])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fastkv_tpu.parallel.sharding import full_param_pspecs

        specs = full_param_pspecs(cfg)
        params = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, specs, is_leaf=lambda x: isinstance(x, P),
        )
    return params
