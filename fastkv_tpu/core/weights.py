"""Weight loading: local HF checkpoint dir (safetensors) -> stacked param pytree.

The reference loads weights through transformers' from_pretrained
(reference: eval/run_longbench.py:311-318); here safetensors shards are read
directly and placed per-leaf onto the mesh sharding (no torch in the load
path). Works fully offline given a local model directory with config.json +
*.safetensors (+ optional index json).

STREAMED: every leaf is materialized with jax.make_array_from_callback — the
callback reads exactly the requested (layer-range, row-range, col-range) block
from the safetensors slice API, so host RAM peaks at ONE addressable shard of
ONE leaf, never the whole checkpoint (round 2 stacked the full checkpoint on
the host first, which made the llama-3.1-70b preset unloadable). Stacked layer
leaves ([L, in, out]) assemble their block layer-by-layer from the per-layer
HF tensors, transposing on the fly (HF Linear stores [out, in]).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

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


class ShardReader:
    """Lazy block reads across the safetensors shards of a checkpoint dir.

    Keeps file handles open, reads only the requested element ranges
    (safetensors' get_slice does a ranged read, not a full-tensor load).
    """

    def __init__(self, model_dir: str):
        from safetensors import safe_open

        self._safe_open = safe_open
        self.model_dir = model_dir
        self.name_to_file: Dict[str, str] = {}
        index_path = os.path.join(model_dir, "model.safetensors.index.json")
        if os.path.exists(index_path):
            with open(index_path) as f:
                self.name_to_file = dict(json.load(f)["weight_map"])
        else:
            single = "model.safetensors"
            with safe_open(os.path.join(model_dir, single), framework="np") as f:
                for n in f.keys():
                    self.name_to_file[n] = single
        self._handles: Dict[str, Any] = {}

    def _handle(self, name: str):
        fname = self.name_to_file[name]
        if fname not in self._handles:
            self._handles[fname] = self._safe_open(
                os.path.join(self.model_dir, fname), framework="np"
            )
        return self._handles[fname]

    def read(self, name: str, index: Tuple[slice, ...] = ()) -> np.ndarray:
        """Read a block of tensor `name`; () reads the whole tensor."""
        sl = self._handle(name).get_slice(name)
        return sl[index] if index else sl[:]

    def names(self):
        return self.name_to_file.keys()


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


def _sharding_for(mesh, spec, dev):
    from jax.sharding import NamedSharding, SingleDeviceSharding

    if mesh is not None:
        return NamedSharding(mesh, spec)
    return SingleDeviceSharding(dev)


def load_params(
    model_dir: str,
    cfg: ModelConfig,
    mesh=None,
    dtype=None,
) -> Dict[str, Any]:
    """Stream-load and convert weights; leaves land per the TP specs.

    Host-RAM peak is one addressable shard of one leaf: with a TP mesh each
    device's callback reads a 1/TP block; single-device, one full leaf (the
    largest stacked leaf of a model that fits one device also fits its host).
    """
    from jax.sharding import PartitionSpec as P

    from fastkv_tpu.parallel.sharding import full_param_pspecs

    dtype = jnp.dtype(dtype or cfg.dtype)
    L = cfg.num_layers
    reader = ShardReader(model_dir)
    dev = jax.devices()[0]
    specs = full_param_pspecs(cfg)

    def build(shape, spec, out_dtype, cb: Callable[[Tuple[slice, ...]], np.ndarray]):
        sharding = _sharding_for(mesh, spec, dev)

        def data_cb(index):
            return np.asarray(cb(tuple(index)), dtype=out_dtype)

        return jax.make_array_from_callback(shape, sharding, data_cb)

    def whole(name, transpose=False):
        def cb(index):
            if transpose:
                # W stored [out, in]; we want W.T[index] = W[swapped index].T
                i, o = index if index else (slice(None), slice(None))
                return reader.read(name, (o, i)).T
            return reader.read(name, index)

        return cb

    def stacked_linear(fmt):
        """[L, in, out] from per-layer [out, in] tensors, layer-by-layer."""

        def cb(index):
            lsl, isl, osl = index if index else (slice(None),) * 3
            blocks = [
                reader.read(fmt.format(l), (osl, isl)).T
                for l in range(*lsl.indices(L))
            ]
            return np.stack(blocks)

        return cb

    def stacked_norm(fmt):
        def cb(index):
            lsl, dsl = index if index else (slice(None),) * 2
            return np.stack(
                [reader.read(fmt.format(l), (dsl,)) for l in range(*lsl.indices(L))]
            )

        return cb

    D, H, KH, dh, F = (
        cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
        cfg.intermediate_size,
    )
    hf = "model.layers.{}."
    layer_shapes = {
        "wq": (D, H * dh), "wk": (D, KH * dh), "wv": (D, KH * dh),
        "wo": (H * dh, D), "w_gate": (D, F), "w_up": (D, F), "w_down": (F, D),
    }
    inv_layer_map = {v: k for k, v in _LAYER_MAP.items()}

    params: Dict[str, Any] = {
        "embed": build(
            (cfg.vocab_size, D), specs["embed"], dtype,
            whole("model.embed_tokens.weight"),
        ),
        "final_norm": build(
            (D,), specs["final_norm"], jnp.float32, whole("model.norm.weight")
        ),
        "layers": {},
    }
    for key, shp in layer_shapes.items():
        params["layers"][key] = build(
            (L,) + shp, specs["layers"][key], dtype,
            stacked_linear(hf + inv_layer_map[key]),
        )
    for key in ("ln_attn", "ln_mlp"):
        params["layers"][key] = build(
            (L, D), specs["layers"][key], jnp.float32,
            stacked_norm(hf + inv_layer_map[key]),
        )
    if not cfg.tie_word_embeddings:
        if "lm_head.weight" not in reader.name_to_file:
            raise ValueError("config says untied embeddings but no lm_head found")
        params["lm_head"] = build(
            (D, cfg.vocab_size), specs["lm_head"], dtype,
            whole("lm_head.weight", transpose=True),
        )
    return params
