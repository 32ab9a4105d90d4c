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


