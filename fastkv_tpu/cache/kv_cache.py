"""Static-shape compressed KV cache.

Layout (one pytree, stacked across layers so the decode step scans over layers):

    k, v   : [L, b, CH, C_total, d]   CH = cache heads (kv heads, or query heads
                                      for the reference SnapKV/H2O layout)
    pos    : [L, b, CH, C_total] int32  original position ids of cached tokens
    valid  : [L, b, CH, C_total] bool   slot validity

    C_total = prefill_capacity + decode_capacity.

Prefill writes its (possibly hole-y) keep-set into slots [0, prefill_capacity);
rank-masked invalid slots simply stay invalid — attention masks them. Decode
appends token t at the *static* slot prefill_capacity + t, so cache updates are
`dynamic_update_slice` at trace-static offsets (no scatters, no per-example
dynamic append index). This replaces the reference's DynamicCache list-of-tensors
(which re-allocates and re-concatenates per step; see transformers DynamicCache
usage at eval/run_longbench.py:311-318) with an XLA-friendly fixed buffer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, b, CH, C_total, d] (bf16, or int8 when quantized)
    v: jnp.ndarray  # [L, b, CH, C_total, d]
    pos: jnp.ndarray  # [L, b, CH, C_total] int32
    valid: jnp.ndarray  # [L, b, CH, C_total] bool
    # int8 mode (EngineConfig.kv_int8): per-(head, slot) fp32 absmax scales,
    # folded into attention (ops.attention.decode_attention) — None otherwise
    k_scale: Optional[jnp.ndarray] = None  # [L, b, CH, C_total]
    v_scale: Optional[jnp.ndarray] = None

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    def layer_count(self) -> jnp.ndarray:
        """Valid entries per (layer, example): [L, b] int32."""
        return jnp.sum(self.valid, axis=(2, 3)) // self.k.shape[2]


def empty_cache(
    num_layers: int,
    batch: int,
    cache_heads: int,
    capacity: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    kv_int8: bool = False,
) -> KVCache:
    shape = (num_layers, batch, cache_heads, capacity, head_dim)
    if kv_int8:
        dtype = jnp.int8
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        pos=jnp.zeros(shape[:-1], jnp.int32),
        valid=jnp.zeros(shape[:-1], bool),
        k_scale=jnp.zeros(shape[:-1], jnp.float32) if kv_int8 else None,
        v_scale=jnp.zeros(shape[:-1], jnp.float32) if kv_int8 else None,
    )


def write_prefill_layer(
    k_kept: jnp.ndarray,  # [b, CH, Cp, d]
    v_kept: jnp.ndarray,
    pos_kept: jnp.ndarray,  # [b, CH, Cp]
    valid_kept: jnp.ndarray,
    decode_capacity: int,
):
    """Produce one layer's cache arrays with decode headroom appended (as zeros).

    Used as the per-layer output inside the prefill layer scan; `lax.scan`
    stacks these into the [L, ...] cache arrays.
    """
    b, ch, cp, d = k_kept.shape
    pad_kv = ((0, 0), (0, 0), (0, decode_capacity), (0, 0))
    pad_m = ((0, 0), (0, 0), (0, decode_capacity))
    return (
        jnp.pad(k_kept, pad_kv),
        jnp.pad(v_kept, pad_kv),
        jnp.pad(pos_kept, pad_m),
        jnp.pad(valid_kept, pad_m),
    )


def append_decode_token(
    cache: KVCache,
    k_new: jnp.ndarray,  # [L, b, CH, 1, d]
    v_new: jnp.ndarray,
    pos_new: jnp.ndarray,  # [b] int32 position of the new token
    slot: jnp.ndarray,  # traced scalar int32: prefill_capacity + step
) -> KVCache:
    """Append one decoded token's K/V at `slot` across all layers."""
    L, b, ch, c, d = cache.k.shape
    zeros = jnp.zeros((), jnp.int32)
    k = jax.lax.dynamic_update_slice(cache.k, k_new, (zeros, zeros, zeros, slot, zeros))
    v = jax.lax.dynamic_update_slice(cache.v, v_new, (zeros, zeros, zeros, slot, zeros))
    pos_blk = jnp.broadcast_to(pos_new[None, :, None, None], (L, b, ch, 1)).astype(jnp.int32)
    pos = jax.lax.dynamic_update_slice(cache.pos, pos_blk, (zeros, zeros, zeros, slot))
    valid_blk = jnp.ones((L, b, ch, 1), bool)
    valid = jax.lax.dynamic_update_slice(cache.valid, valid_blk, (zeros, zeros, zeros, slot))
    return KVCache(k=k, v=v, pos=pos, valid=valid)
