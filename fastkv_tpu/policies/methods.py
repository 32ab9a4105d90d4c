"""Per-method eviction policies as pure functions over (scores, layout, budgets).

Each policy answers: *which prompt-token indices does each cache head keep?*
The returned keep-set covers the FULL kept cache (selected tokens plus the
observation window), so the engine's job is a single gather of K/V/positions.

Method semantics and their reference sources:
  * fastkv       — pooled window scores, summed over GQA groups per kv head,
                   top-k per kv head; TSP token set = top-k of the kv-head-summed
                   scores plus the window (baselines/fastkv/utils.py:80-134).
  * snapkv       — pooled window scores per *query* head (cache stores repeated
                   heads in the reference flash path: snapkv/llama_model.py:385,
                   402), top-k per query head (snapkv/utils.py:57-102).
  * h2o          — full accumulated attention mass (no pooling), per query head
                   (h2o/utils.py:51-89; repeat at h2o/llama_model.py:385).
  * streamingllm — positional: attention sinks + recent window, per kv head
                   (streamingllm/utils.py:51-80; the flash path does NOT repeat:
                   streamingllm/llama_model.py:375). In proportional mode the
                   recent window itself is dynamic: cap - 4 tokens.
  * fullkv       — keep everything (baselines/fullkv/llama_model.py).
GemFilter and PyramidInfer are engine-level strategies (two-pass / per-layer
pyramid) — see fastkv_tpu.engine.gemfilter / fastkv_tpu.policies.pyramid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fastkv_tpu.core.config import Method, MethodConfig, ModelConfig
from fastkv_tpu.ops.attention import pool_scores
from fastkv_tpu.policies import selection


class KeepSet(NamedTuple):
    """Kept prompt-token indices per cache head. idx/valid: [b, ch, capacity]."""

    idx: jnp.ndarray
    valid: jnp.ndarray


class TspSet(NamedTuple):
    """Position-sorted surviving token indices at the TSP layer. [b, tsp_capacity]."""

    idx: jnp.ndarray
    valid: jnp.ndarray


def cache_heads(method: Method, cfg: ModelConfig) -> int:
    """How many head rows the compressed cache stores for this method."""
    if method in (Method.SNAPKV, Method.H2O):
        return cfg.num_heads  # reference stores repeated heads in the flash path
    return cfg.num_kv_heads


def score_based_keep(
    method: Method,
    mcfg: MethodConfig,
    cfg: ModelConfig,
    raw_scores: jnp.ndarray,  # [b, num_heads, s] fp32 (window or h2o scores)
    selectable: jnp.ndarray,  # [b, s] bool: non-window & valid columns
    window_idx: jnp.ndarray,  # [b, W] observation-window indices
    window_valid: jnp.ndarray,  # [b, W]
    k_budget: jnp.ndarray,  # [b] traced non-window keep budget
    keep_capacity: int,  # static capacity for the non-window part
) -> KeepSet:
    """snapkv/h2o/fastkv keep-set: top-k of scores plus the window verbatim
    (reference concat of gathered past + current window, snapkv/utils.py:96-101)."""
    if method == Method.H2O:
        pooled = raw_scores  # H2O applies no pooling (h2o/utils.py:75)
    else:
        pooled = pool_scores(raw_scores, selectable, mcfg.kernel_size, mcfg.pooling)
    if method == Method.FASTKV:
        pooled = selection.group_sum(pooled, cfg.num_kv_groups)
    top_idx, top_valid = selection.topk_select(pooled, selectable, k_budget, keep_capacity)
    ch = top_idx.shape[1]
    win_idx = jnp.broadcast_to(window_idx[:, None, :], (top_idx.shape[0], ch, window_idx.shape[-1]))
    win_valid = jnp.broadcast_to(window_valid[:, None, :], win_idx.shape)
    return KeepSet(
        jnp.concatenate([top_idx, win_idx], axis=-1),
        jnp.concatenate([top_valid, win_valid], axis=-1),
    )


def fastkv_tsp_set(
    mcfg: MethodConfig,
    cfg: ModelConfig,
    raw_scores: jnp.ndarray,  # [b, num_heads, s]
    selectable: jnp.ndarray,
    window_idx: jnp.ndarray,  # [b, W]
    window_valid: jnp.ndarray,
    tsp_budget: jnp.ndarray,  # [b] non-window TSP budget
    tsp_capacity: int,
) -> TspSet:
    """TSP surviving set = topk(kv-head-summed pooled scores) ∪ window, sorted by
    position (baselines/fastkv/utils.py:126-130)."""
    pooled = pool_scores(raw_scores, selectable, mcfg.kernel_size, mcfg.pooling)
    per_kv = selection.group_sum(pooled, cfg.num_kv_groups)
    summed = per_kv.sum(axis=1, keepdims=True)  # [b, 1, s] sum over kv heads
    top_idx, top_valid = selection.topk_select(summed, selectable, tsp_budget, tsp_capacity)
    b, s = selectable.shape
    rows = jnp.arange(b)[:, None]
    keep_mask = jnp.zeros((b, s), bool)
    keep_mask = keep_mask.at[rows, top_idx[:, 0, :]].max(top_valid[:, 0, :])
    keep_mask = keep_mask.at[rows, window_idx].max(window_valid)
    idx, valid = selection.sorted_union_indices(keep_mask, tsp_capacity)
    return TspSet(idx, valid)


def streamingllm_keep(
    mcfg: MethodConfig,
    num_cache_heads: int,
    batch: int,
    n_true: jnp.ndarray,  # [b] true segment length
    capacity: int,  # static total capacity
) -> KeepSet:
    """Sinks + recent window, closed form (no scores).

    Proportional (streamingllm/utils.py:59-61 + monkeypatch.py:112):
      cap = int(n * retain); window = cap - 4; sinks = first 4 tokens.
    Constant: cap = max_capacity_prompt; window = mcfg.window_size.
    When n <= cap everything is kept (reference early return, utils.py:63-64).
    """
    if mcfg.eviction_mode == "proportional":
        cap_dyn = jnp.floor(n_true.astype(jnp.float32) * mcfg.retain_rate).astype(jnp.int32)
        n_sink = jnp.full((batch,), 4, jnp.int32)
    else:
        cap_dyn = jnp.full((batch,), mcfg.max_capacity_prompt, jnp.int32)
        n_sink = jnp.full((batch,), mcfg.max_capacity_prompt - mcfg.window_size, jnp.int32)
    keep_all = n_true <= cap_dyn
    cap_eff = jnp.where(keep_all, n_true, cap_dyn)[:, None]  # [b,1]
    sink_eff = jnp.where(keep_all, n_true, n_sink)[:, None]
    rank = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    # rank < sinks -> leading positions; else window tail: n - cap + rank
    idx = jnp.where(rank < sink_eff, rank, n_true[:, None] - cap_eff + rank)
    valid = rank < cap_eff
    idx = jnp.where(valid, idx, 0)
    idx = jnp.broadcast_to(idx[:, None, :], (batch, num_cache_heads, capacity))
    valid = jnp.broadcast_to(valid[:, None, :], idx.shape)
    return KeepSet(idx, valid)


def fullkv_keep(num_cache_heads: int, batch: int, seq: int, n_true: jnp.ndarray) -> KeepSet:
    """Identity keep-set (capacity = padded seq)."""
    rank = jnp.arange(seq, dtype=jnp.int32)[None, None, :]
    idx = jnp.broadcast_to(rank, (batch, num_cache_heads, seq))
    valid = jnp.broadcast_to(rank < n_true[:, None, None], idx.shape)
    return KeepSet(jnp.where(valid, idx, 0), valid)
