"""PyramidInfer: per-layer pyramidal compression of hidden states AND KV cache.

Reference semantics (baselines/pyramidinfer/llama_model.py:903-1135 + configs in
baselines/pyramidinfer/pyramidinfer_configs/*.json):
  * decay schedule over depth (cosine/linear) from prefill_decay_ratio (:1041-1046)
  * scores: attention probs of the last (1 + recent) rows, averaged over heads,
    distance-weighted linspace(1.0, distance_weight) over rows, averaged over
    rows (:1050-1054); sink tokens pinned to +inf (:1055)
  * per compressing layer (every layerwise_downsample_interval): top-k of the
    context part (keep everything when below min_context_length), gather BOTH
    hidden states and original position ids (:1060-1070) — the next layer sees
    a shorter sequence, hence the pyramid
  * each layer's cache holds its own (already-shrunk) input K/V — per-layer
    cache lengths decrease with depth
  * recent_length = int(total_seq * recent_ratio), computed once (:991)

TPU re-architecture: layers run UNROLLED with per-layer *static* capacities
derived from the padded bucket through the same schedule (the schedule is
data-independent); per-example true budgets stay traced. Scores come from an
O(R * s) windowed pass over the last (1 + recent) rows — the reference needs
eager attention and materializes full s x s probs, which is why it is capped
at 8K context (eval/run_longbench.py:117-119); this formulation has no such
cap. Conscious round-1 divergence: the generation-stage periodic cache rewrite
(:1076-1129) is not yet applied — decode keeps appended tokens (strictly more
context retained than the reference; memory is bounded by max_new_tokens).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from fastkv_tpu.cache.kv_cache import KVCache
from fastkv_tpu.core.config import EngineConfig, MethodConfig, ModelConfig, round_up
from fastkv_tpu.engine.prefill import PrefillShapes, SeqState, _attend
from fastkv_tpu.models import llama
from fastkv_tpu.models.rope import compute_inv_freq
from fastkv_tpu.ops import attention as att
from fastkv_tpu.policies import selection


def decay_ratio(mcfg: MethodConfig, layer: int, num_layers: int) -> float:
    base = mcfg.pyramid_decay_ratio
    if mcfg.pyramid_decay_strategy == "linear":
        return (1.0 - base) * (layer / num_layers) + base
    if mcfg.pyramid_decay_strategy == "cosine":
        return (1.0 - base) * (math.cos(math.pi * layer / num_layers) + 1) / 2 + base
    return base


def plan_layer_lengths(
    cfg: ModelConfig, mcfg: MethodConfig, bucket: int, align: int = 128
) -> List[int]:
    """Static per-layer sequence capacities [num_layers + 1] (input of layer l)."""
    recent_cap = int(bucket * mcfg.pyramid_recent_ratio)
    lengths = [bucket]
    s = bucket
    for l in range(cfg.num_layers):
        r = decay_ratio(mcfg, l, cfg.num_layers)
        ctx = s - (1 + recent_cap)
        compresses = (l % mcfg.pyramid_downsample_interval) == 0
        if compresses and ctx > mcfg.pyramid_min_context_length and r < 1.0:
            topk = int(ctx * r)
            if topk <= mcfg.pyramid_min_context_length:
                topk = ctx
            new_s = min(round_up(topk + 1 + recent_cap, align), s)
        else:
            new_s = s
        s = new_s
        lengths.append(s)
    return lengths


def _recent_scores(
    cfg: ModelConfig,
    mcfg: MethodConfig,
    q: jnp.ndarray,  # [b, H, s, d]
    k: jnp.ndarray,  # [b, KH, s, d]
    state: SeqState,
    recent_dyn: jnp.ndarray,  # [b] int32 = int(n_orig * recent_ratio)
    recent_cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean over heads and (distance-weighted) recent rows of the causal
    attention probs; returns (scores [b, s] fp32, context_mask [b, s])."""
    b, h, s, d = q.shape
    rows = recent_cap + 1
    row_idx, row_valid_cap = selection.window_indices(
        state.count - (recent_dyn + 1), rows, state.count
    )
    # rows actually in the recent set: rank from end < recent_dyn + 1
    rank_from_end = state.count[:, None] - row_idx - 1
    row_valid = row_valid_cap & (rank_from_end < (recent_dyn + 1)[:, None])
    q_rows = jnp.take_along_axis(q, row_idx[:, None, :, None], axis=2)  # [b,H,R,d]
    kh = k.shape[1]
    g = h // kh
    qg = q_rows.reshape(b, kh, g, rows, d)
    logits = jnp.einsum(
        "bkgrd,bksd->bkgrs", qg, k, preferred_element_type=jnp.float32
    ).reshape(b, h, rows, s) * (d**-0.5)
    qp = jnp.take_along_axis(state.positions, row_idx, axis=1)
    attend = (state.positions[:, None, :] <= qp[:, :, None]) & state.valid[:, None, :]
    attend = attend & row_valid[:, :, None]
    logits = jnp.where(attend[:, None, :, :], logits, att.NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = jnp.where(row_valid[:, None, :, None], p, 0.0)
    p = p.mean(axis=1)  # mean over heads -> [b, R, s]

    # distance weight: linspace(1.0, dw, n_rows) over the *valid* recent rows,
    # in row order (reference :1053); then mean over rows
    n_rows = (recent_dyn + 1).astype(jnp.float32)[:, None]
    # rank among valid rows, 0-based from the oldest recent row
    rank = jnp.cumsum(row_valid.astype(jnp.int32), axis=1) - 1
    w = 1.0 + (mcfg.pyramid_distance_weight - 1.0) * (
        rank.astype(jnp.float32) / jnp.maximum(n_rows - 1.0, 1.0)
    )
    w = jnp.where(row_valid, w, 0.0)
    scores = jnp.sum(p * w[:, :, None], axis=1) / jnp.maximum(n_rows, 1.0)

    # context columns: layout index < count - (1 + recent_dyn)
    idx = jnp.arange(s, dtype=jnp.int32)[None, :]
    context = state.valid & (idx < (state.count - (recent_dyn + 1))[:, None])
    # sink pin (+inf) on the first sink_len layout slots (reference :1055)
    sink = idx < mcfg.pyramid_sink_len
    scores = jnp.where(sink & context, jnp.float32(3.0e38), scores)
    return jnp.where(context, scores, 0.0), context


def prefill(
    params: Dict[str, Any],
    cfg: ModelConfig,
    mcfg: MethodConfig,
    ecfg: EngineConfig,
    shapes: PrefillShapes,
    tokens: jnp.ndarray,  # [b, bucket]
    n_true: jnp.ndarray,  # [b]
) -> Tuple[jnp.ndarray, KVCache]:
    """Pyramidal prefill. Cache capacity is uniform (= bucket + decode room);
    per-layer contents follow the pyramid (validity-masked)."""
    b, s0 = tokens.shape
    inv_freq = jnp.asarray(compute_inv_freq(cfg))
    lengths = plan_layer_lengths(cfg, mcfg, s0, ecfg.capacity_align)
    recent_cap = int(s0 * mcfg.pyramid_recent_ratio)
    recent_dyn = jnp.floor(n_true.astype(jnp.float32) * mcfg.pyramid_recent_ratio).astype(jnp.int32)

    h = llama.embed(params, cfg, tokens)
    positions = jnp.broadcast_to(jnp.arange(s0, dtype=jnp.int32)[None, :], (b, s0))
    valid = positions < n_true[:, None]
    state = SeqState(h=h, positions=positions, valid=valid, count=n_true, n_orig=n_true)

    cache_layers = []
    cap_total = shapes.total_capacity
    for l in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda x: x[l], params["layers"])
        hn = llama.rms_norm(state.h, lp["ln_attn"], cfg.rms_norm_eps)
        q, k, v = llama.qkv_proj(lp, cfg, hn)
        q, k = llama.rope_qk(q, k, state.positions, inv_freq)
        attn = _attend(cfg, q, k, v, state, ecfg.use_pallas)
        h = state.h + llama.attn_out_proj(lp, attn)
        h = h + llama.mlp(lp, llama.rms_norm(h, lp["ln_mlp"], cfg.rms_norm_eps))
        state = state._replace(h=h)

        # layer cache = this layer's (already shrunk) K/V, padded to cap_total
        s_l = k.shape[2]
        pad = cap_total - s_l
        ch = cfg.num_kv_heads
        pos_b = jnp.broadcast_to(state.positions[:, None, :], (b, ch, s_l))
        val_b = jnp.broadcast_to(state.valid[:, None, :], (b, ch, s_l))
        cache_layers.append(
            (
                jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0))),
                jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0))),
                jnp.pad(pos_b, ((0, 0), (0, 0), (0, pad))),
                jnp.pad(val_b, ((0, 0), (0, 0), (0, pad))),
            )
        )

        # pyramid shrink between layers
        new_cap = lengths[l + 1]
        if new_cap < s_l:
            scores, context = _recent_scores(cfg, mcfg, q, k, state, recent_dyn, recent_cap)
            ctx_dyn = jnp.maximum(state.count - (recent_dyn + 1), 0)
            r = decay_ratio(mcfg, l, cfg.num_layers)
            topk_dyn = jnp.floor(ctx_dyn.astype(jnp.float32) * r).astype(jnp.int32)
            # keep everything when target falls below min_context_length or the
            # context itself is small (reference :1057-1060)
            keep_all = (ctx_dyn <= mcfg.pyramid_min_context_length) | (
                topk_dyn <= mcfg.pyramid_min_context_length
            )
            topk_dyn = jnp.where(keep_all, ctx_dyn, topk_dyn)
            ctx_keep_cap = max(new_cap - 1 - recent_cap, 1)
            top_idx, top_valid = selection.topk_select(
                scores[:, None, :], context, topk_dyn, ctx_keep_cap
            )
            keep_mask = jnp.zeros((b, s_l), bool)
            keep_mask = keep_mask.at[
                jnp.arange(b)[:, None], top_idx[:, 0, :]
            ].max(top_valid[:, 0, :])
            # recent rows (incl. the boundary row) always survive
            idx = jnp.arange(s_l, dtype=jnp.int32)[None, :]
            recent_mask = state.valid & (idx >= (state.count - (recent_dyn + 1))[:, None])
            keep_mask = keep_mask | recent_mask
            sel_idx, sel_valid = selection.sorted_union_indices(keep_mask, new_cap)
            h_new = selection.gather_tokens(state.h, sel_idx)
            h_new = jnp.where(sel_valid[:, :, None], h_new, 0)
            pos_new = jnp.take_along_axis(state.positions, sel_idx, axis=1)
            pos_new = jnp.where(sel_valid, pos_new, 0)
            count_new = jnp.sum(sel_valid, axis=-1).astype(jnp.int32)
            state = SeqState(
                h=h_new, positions=pos_new, valid=sel_valid,
                count=count_new, n_orig=state.n_orig,
            )
        elif new_cap < state.h.shape[1]:
            # static truncation without selection (should not happen; guard)
            state = SeqState(
                h=state.h[:, :new_cap], positions=state.positions[:, :new_cap],
                valid=state.valid[:, :new_cap], count=jnp.minimum(state.count, new_cap),
                n_orig=state.n_orig,
            )

    cache = KVCache(
        k=jnp.stack([c[0] for c in cache_layers]),
        v=jnp.stack([c[1] for c in cache_layers]),
        pos=jnp.stack([c[2] for c in cache_layers]),
        valid=jnp.stack([c[3] for c in cache_layers]),
    )
    last_idx = jnp.maximum(state.count - 1, 0)[:, None]
    h_last = selection.gather_tokens(state.h, last_idx)
    logits = llama.unembed(params, cfg, h_last)[:, 0, :]
    return logits, cache
