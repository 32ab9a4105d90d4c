"""Llama/Mistral model family as pure-functional JAX pytrees.

Design (TPU-first, not a port):
  * Parameters are *stacked across layers* — every per-layer weight is one array
    with a leading [num_layers] axis, so the decoder runs as `lax.scan` over
    layers: O(1) trace/compile time in depth (80-layer 70B compiles as fast as
    the 16-layer 1B) and XLA sees one fused layer body.
  * All shape-changing behavior (TSP gather, compression) lives OUTSIDE the layer
    body in the engine; the layer body is shape-static.
  * Weights live in bf16 (configurable); norms/softmax/rope run fp32.

Covers the reference model matrix: Llama-3.1/3.2 (GQA, llama3 rope scaling) and
Mistral/Ministral (GQA, optional sliding window) — reference:
baselines/fastkv/llama_model.py, baselines/fastkv/mistral_model.py. The two
families differ only in config values here (one code path), where the reference
maintains two parallel patched-model files per method.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastkv_tpu.core.config import ModelConfig
from fastkv_tpu.models.rope import apply_rope, compute_inv_freq, rope_cos_sin

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter construction / import
# ---------------------------------------------------------------------------

def param_shapes(cfg: ModelConfig) -> Dict[str, Tuple[int, ...]]:
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, KH, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    shapes = {
        "embed": (cfg.vocab_size, D),
        "final_norm": (D,),
        "layers.wq": (L, D, H * dh),
        "layers.wk": (L, D, KH * dh),
        "layers.wv": (L, D, KH * dh),
        "layers.wo": (L, H * dh, D),
        "layers.w_gate": (L, D, F),
        "layers.w_up": (L, D, F),
        "layers.w_down": (L, F, D),
        "layers.ln_attn": (L, D),
        "layers.ln_mlp": (L, D),
    }
    if not cfg.tie_word_embeddings:
        shapes["lm_head"] = (D, cfg.vocab_size)
    return shapes


def _unflatten(flat: Dict[str, jnp.ndarray]) -> Params:
    params: Params = {"layers": {}}
    for k, v in flat.items():
        if k.startswith("layers."):
            params["layers"][k[len("layers.") :]] = v
        else:
            params[k] = v
    return params


def init_params(cfg: ModelConfig, seed: int = 0) -> Params:
    """Random-normal init (for tests/benchmarks; real weights come from HF)."""
    rng = np.random.default_rng(seed)
    dtype = jnp.dtype(cfg.dtype)
    flat = {}
    for k, shp in param_shapes(cfg).items():
        if k.endswith("norm") or "ln_" in k:
            arr = np.ones(shp, np.float32)
        else:
            arr = (rng.standard_normal(shp) * 0.02).astype(np.float32)
        flat[k] = jnp.asarray(arr, dtype=dtype if arr.ndim > 1 else jnp.float32)
    return _unflatten(flat)


def init_params_on_device(cfg: ModelConfig, seed: int = 0) -> Params:
    """Random init directly on the default device (jit-compiled jax.random).

    Avoids host->device transfer of gigabytes of random weights — essential in
    environments where the accelerator sits behind a slow transport; only the
    PRNG key crosses the wire.
    """
    dtype = jnp.dtype(cfg.dtype)
    shapes = param_shapes(cfg)

    @jax.jit
    def build(key):
        flat = {}
        for name, shp in sorted(shapes.items()):
            key, sub = jax.random.split(key)
            if name.endswith("norm") or "ln_" in name:
                flat[name] = jnp.ones(shp, jnp.float32)
            else:
                flat[name] = (jax.random.normal(sub, shp, jnp.float32) * 0.02).astype(
                    dtype if len(shp) > 1 else jnp.float32
                )
        return flat

    return _unflatten(build(jax.random.PRNGKey(seed)))


def init_params_int8_on_device(
    cfg: ModelConfig, seed: int = 0, quantize_embed: bool = True
) -> Params:
    """Random init DIRECTLY into the int8 weight-only format, on device.

    An 8B model's bf16 weights (16 GB) do not fit a 16 GB v5e, so
    init-then-quantize OOMs before the int8 copy exists. This builds each
    weight stack with one jitted program that generates and quantizes ONE
    LAYER at a time (lax.map), so the bf16/f32 transient is a single layer's
    weight (<= 235 MB for 8B w_gate), never a full stack. Output tree matches
    core.quant.quantize_params_int8 exactly (int8 weights + `_scale` f32
    siblings; norms f32)."""
    from fastkv_tpu.core.quant import absmax_quantize

    shapes = param_shapes(cfg)
    key = jax.random.PRNGKey(seed)
    flat: Dict[str, Any] = {}
    scales: Dict[str, Any] = {}

    def gen_quant(sub, shp, axis):
        w = jax.random.normal(sub, shp, jnp.float32) * 0.02
        return absmax_quantize(w, axis=axis)

    for idx, (name, shp) in enumerate(sorted(shapes.items())):
        sub = jax.random.fold_in(key, idx)
        if name.endswith("norm") or "ln_" in name:
            flat[name] = jax.jit(lambda s=shp: jnp.ones(s, jnp.float32))()
        elif name.startswith("layers."):
            L = shp[0]

            def per_layer(k, s=shp):
                return gen_quant(k, s[1:], axis=0)  # contraction = "in"

            wi, sc = jax.jit(
                lambda k: jax.lax.map(per_layer, jax.random.split(k, L))
            )(sub)
            flat[name] = wi
            scales[name + "_scale"] = sc  # keepdims map -> [L, 1, out]
        elif name == "lm_head":
            wi, sc = jax.jit(lambda k: gen_quant(k, shp, 0))(sub)
            flat[name], scales[name + "_scale"] = wi, sc
        elif name == "embed" and quantize_embed:
            # per-row scales (== per-output-channel of the tied LM head)
            wi, sc = jax.jit(lambda k: gen_quant(k, shp, 1))(sub)
            flat[name], scales[name + "_scale"] = wi, sc
        else:
            flat[name] = jax.jit(
                lambda k, s=shp: (jax.random.normal(k, s, jnp.float32) * 0.02).astype(
                    jnp.dtype(cfg.dtype)
                )
            )(sub)
    params = _unflatten(flat)
    for name, sc in scales.items():
        if name.startswith("layers."):
            params["layers"][name[len("layers.") :]] = sc
        else:
            params[name] = sc
    return params


def params_from_hf_state_dict(cfg: ModelConfig, sd, dtype=None) -> Params:
    """Convert a HuggingFace Llama/Mistral state dict (name -> numpy array).

    HF nn.Linear stores [out, in]; we store [in, out] so forward is x @ W.
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    L = cfg.num_layers

    def get(name):
        t = sd[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t, np.float32)

    def stack_linear(fmt):
        return jnp.asarray(
            np.stack([get(fmt.format(i)).T for i in range(L)]), dtype=dtype
        )

    def stack_norm(fmt):
        return jnp.asarray(
            np.stack([get(fmt.format(i)) for i in range(L)]), dtype=jnp.float32
        )

    flat = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype=dtype),
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype=jnp.float32),
        "layers.wq": stack_linear("model.layers.{}.self_attn.q_proj.weight"),
        "layers.wk": stack_linear("model.layers.{}.self_attn.k_proj.weight"),
        "layers.wv": stack_linear("model.layers.{}.self_attn.v_proj.weight"),
        "layers.wo": stack_linear("model.layers.{}.self_attn.o_proj.weight"),
        "layers.w_gate": stack_linear("model.layers.{}.mlp.gate_proj.weight"),
        "layers.w_up": stack_linear("model.layers.{}.mlp.up_proj.weight"),
        "layers.w_down": stack_linear("model.layers.{}.mlp.down_proj.weight"),
        "layers.ln_attn": stack_norm("model.layers.{}.input_layernorm.weight"),
        "layers.ln_mlp": stack_norm("model.layers.{}.post_attention_layernorm.weight"),
    }
    if not cfg.tie_word_embeddings:
        flat["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype=dtype)
    return _unflatten(flat)




# ---------------------------------------------------------------------------
# Forward building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * w.astype(jnp.float32)).astype(x.dtype)


def linear(lp: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """x @ lp[name], transparently handling int8 weight-only quantization.

    When a `<name>_scale` sibling exists (see core.quant.quantize_params_int8)
    the weight is int8 with per-output-channel fp32 scales: the dot runs with
    the int8 operand converted in-stream (XLA reads 1 byte/element from HBM —
    the decode-roofline win) and the fp32 product is scaled per column.
    """
    w = lp[name]
    s = lp.get(name + "_scale")
    if s is None:
        return x @ w
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * s).astype(x.dtype)


def qkv_proj(lp: Params, cfg: ModelConfig, h_normed: jnp.ndarray):
    """h_normed [b, s, D] -> q [b, H, s, d], k/v [b, KH, s, d] (pre-RoPE)."""
    b, s, _ = h_normed.shape
    q = linear(lp, "wq", h_normed)
    k = linear(lp, "wk", h_normed)
    v = linear(lp, "wv", h_normed)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    return q, k, v


def mlp(lp: Params, x: jnp.ndarray, chunk: int = 0) -> jnp.ndarray:
    """Gated MLP. With `chunk` > 0 and s a multiple of it, the sequence axis is
    processed in chunks under lax.map so the [s, intermediate] gate/up
    activations never materialize at full length — at 128K+ prefill those are
    the peak-memory term (e.g. 2 x 4 GB bf16 at 256K for the 1B config), not
    the weights or the cache. Pure sequence tiling: results are bit-identical.
    """
    if chunk and x.shape[1] > chunk and x.shape[1] % chunk == 0:
        b, s, dm = x.shape
        xs = x.reshape(b, s // chunk, chunk, dm).transpose(1, 0, 2, 3)
        ys = jax.lax.map(lambda c: mlp(lp, c), xs)
        return ys.transpose(1, 0, 2, 3).reshape(b, s, dm)
    gate = linear(lp, "w_gate", x)
    up = linear(lp, "w_up", x)
    return linear(lp, "w_down", jax.nn.silu(gate) * up)


def attn_out_proj(lp: Params, attn: jnp.ndarray) -> jnp.ndarray:
    """attn [b, H, s, d] -> [b, s, D]."""
    b, H, s, d = attn.shape
    return linear(lp, "wo", attn.transpose(0, 2, 1, 3).reshape(b, s, H * d))


def embed(params: Params, cfg: ModelConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    rows = jnp.take(params["embed"], tokens, axis=0)
    s = params.get("embed_scale")
    if s is None:
        return rows
    # int8 table: per-row scales gathered alongside (core.quant)
    dtype = jnp.dtype(cfg.dtype)
    return (rows.astype(jnp.float32) * jnp.take(s, tokens, axis=0)).astype(dtype)


def unembed(params: Params, cfg: ModelConfig, h: jnp.ndarray) -> jnp.ndarray:
    """Final norm + LM head. h [b, s, D] -> logits [b, s, V] fp32."""
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        w, s = params["embed"], params.get("embed_scale")
        y = jnp.einsum(
            "bsd,vd->bsv", h, w.astype(h.dtype), preferred_element_type=jnp.float32
        )
        return y * s[:, 0] if s is not None else y
    w, s = params["lm_head"], params.get("lm_head_scale")
    y = jnp.einsum(
        "bsd,dv->bsv", h, w.astype(h.dtype), preferred_element_type=jnp.float32
    )
    return y * s[0] if s is not None else y


class RopeCache:
    """Holds the (device-resident) inverse frequency vector for a config."""

    def __init__(self, cfg: ModelConfig):
        self.inv_freq = jnp.asarray(compute_inv_freq(cfg))

    def cos_sin(self, positions: jnp.ndarray):
        return rope_cos_sin(positions, self.inv_freq)


def rope_qk(
    q: jnp.ndarray, k: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray
):
    cos, sin = rope_cos_sin(positions, inv_freq)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)
