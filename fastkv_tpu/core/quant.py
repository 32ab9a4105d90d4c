"""Int8 quantization: weight-only matmul quant + int8 KV cache.

Raises the batch-1 decode roofline: decode is HBM-bandwidth-bound (every step
streams the full weights + KV cache once — see ROOFLINE.md), so storing either
as int8 nearly halves bytes/token. Measured on v5e: int8 weight streaming runs
the decode-style matvec sweep 1.6x faster than bf16 (microbench in ROOFLINE.md).

Scheme (standard weight-only absmax):
  * per-OUTPUT-channel symmetric scales: w_i8 = round(w / s), s = absmax/127
    over the contraction axis. The matmul runs mixed-precision
    (activation dtype x int8) and the fp32 result is scaled per column, so
    dequantization never materializes a bf16 copy of the weight.
  * the embedding table quantizes per ROW (one scale per vocab entry), which
    is simultaneously per-output-channel for the tied LM head.
  * KV cache: per (head, slot) scales folded into the attention math —
    K scales multiply the logit columns, V scales fold into the softmax
    probabilities — so dequantization is two O(C) vector multiplies per step,
    not an O(C*d) tensor op (see ops.attention.decode_attention).

The reference has no quantization support; this subsystem is new TPU scope
(BASELINE.json north_star: tokens/s/chip). Accuracy guardrails are the parity
tests in tests/test_quant.py.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

# weights quantized per layer-stack entry: [L, in, out] -> scale [L, 1, out]
_LAYER_WEIGHTS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def absmax_quantize(w: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization along `axis`. Returns (w_int8, scale_f32)
    with scale shaped like w but size-1 on `axis`."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(a, 1e-12) / 127.0
    wi = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return wi.astype(jnp.int8), scale.astype(jnp.float32)


def quantize_params_int8(
    params: Dict[str, Any], quantize_embed: bool = True
) -> Dict[str, Any]:
    """Weight-only int8 quantization of a llama.py param tree.

    Adds a `<name>_scale` sibling per quantized weight; llama's matmul helper
    detects the sibling and runs the mixed-precision path. Norms stay fp32.
    Pure jnp — wrap in jax.jit to quantize on-device without a host round trip.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for name in _LAYER_WEIGHTS:
        wi, s = absmax_quantize(layers[name], axis=1)  # contraction = "in"
        layers[name] = wi
        layers[name + "_scale"] = s
    out["layers"] = layers
    if "lm_head" in params:
        wi, s = absmax_quantize(params["lm_head"], axis=0)
        out["lm_head"], out["lm_head_scale"] = wi, s
    if quantize_embed:
        # per-row: row scale == per-output-channel scale of the tied LM head
        wi, s = absmax_quantize(params["embed"], axis=1)
        out["embed"], out["embed_scale"] = wi, s
    return out


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize K or V cache entries per (…, slot) over the head_dim axis.

    x: [..., C, d] -> (int8 same shape, scale f32 [..., C])."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(a, 1e-12) / 127.0
    xi = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return xi.astype(jnp.int8), scale.astype(jnp.float32)
