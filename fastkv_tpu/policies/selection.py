"""Token-selection primitives shared by all eviction policies.

Static-shape versions of the reference's `topk` + `gather` eviction
(reference: baselines/snapkv/utils.py:89-101, baselines/fastkv/utils.py:113-121,
126-130). `lax.top_k` is always called with the *static* capacity; the traced
per-example budget only drives a rank-validity mask, so selection is exact for
any true length while XLA sees fixed shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# plain int (NOT jnp.int32): a module-level jnp scalar would initialize the
# XLA backend at import time, breaking jax.distributed.initialize ordering in
# multi-controller processes (engine/serve.py)
BIG_INDEX = 2**30


def topk_select(
    scores: jnp.ndarray,
    selectable: jnp.ndarray,
    k_budget: jnp.ndarray,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k selection with a traced budget under a static capacity.

    scores:      [b, ch, s] fp32 (higher = keep)
    selectable:  [b, s] bool — columns eligible for selection (non-window, valid)
    k_budget:    [b] int32 — how many of the top-capacity picks are real
    capacity:    static int >= max(k_budget)

    Returns (indices [b, ch, capacity] int32, valid [b, ch, capacity] bool).
    Indices of invalid slots are clamped to 0 — callers must apply `valid`.
    """
    masked = jnp.where(selectable[:, None, :], scores, -jnp.inf)
    _, idx = jax.lax.top_k(masked, capacity)  # sorted by score desc
    rank = jnp.arange(capacity)[None, None, :]
    n_selectable = jnp.sum(selectable, axis=-1).astype(jnp.int32)  # [b]
    k_eff = jnp.minimum(k_budget, n_selectable)[:, None, None]
    valid = jnp.broadcast_to(rank < k_eff, idx.shape)
    return jnp.where(valid, idx, 0), valid


def group_sum(scores: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """Sum per-query-head scores into per-kv-head scores.

    Head ordering follows HF repeat_kv: query head h maps to kv head h // groups
    (reference: baselines/fastkv/utils.py:13-22,112 — `.view(b, kv, groups, s)
    .sum(dim=-2)` on kv-major repeated heads).
    scores [b, H, s] -> [b, H // num_groups, s].
    """
    b, h, s = scores.shape
    return scores.reshape(b, h // num_groups, num_groups, s).sum(axis=2)


def sorted_union_indices(
    select_mask: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Turn a boolean keep-mask [b, s] into position-sorted indices [b, capacity].

    Reproduces the reference's `cat([tsp_topk, window]); sort` step
    (baselines/fastkv/utils.py:127-130) without dynamic shapes: selected indices
    come out ascending; invalid slots point at 0 with valid=False.
    """
    s = select_mask.shape[-1]
    iota = jnp.arange(s, dtype=jnp.int32)[None, :]
    keyed = jnp.where(select_mask, iota, BIG_INDEX)
    srt = jnp.sort(keyed, axis=-1)[:, :capacity]
    valid = srt < BIG_INDEX
    return jnp.where(valid, srt, 0), valid


def gather_tokens(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along the sequence axis.

    x [b, s, ...] or [b, ch, s, d]; idx [b, k] or [b, ch, k] respectively.
    """
    if x.ndim == 3 and idx.ndim == 2:  # [b, s, d_model]
        return jnp.take_along_axis(x, idx[:, :, None], axis=1)
    if x.ndim == 2 and idx.ndim == 2:  # [b, s]
        return jnp.take_along_axis(x, idx, axis=1)
    if x.ndim == 4 and idx.ndim == 3:  # [b, ch, s, d]
        return jnp.take_along_axis(x, idx[:, :, :, None], axis=2)
    raise ValueError(f"unsupported gather ranks {x.shape} / {idx.shape}")


def window_indices(
    window_start: jnp.ndarray, window_size: int, n_valid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the observation window: [win_start, win_start + W).

    window_start: [b] int32 (= n_valid - W, clamped at 0). Returns
    (idx [b, W], valid [b, W]); slots past n_valid are invalid (short prompts).
    """
    w = jnp.arange(window_size, dtype=jnp.int32)[None, :]
    start = jnp.maximum(window_start, 0)[:, None]
    idx = start + w
    valid = idx < n_valid[:, None]
    return jnp.where(valid, idx, 0), valid
