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
cap.

Generation stage (reference :1076-1129): every time a layer's uncompressed
region grows past `exceed_length_to_compress`, the `exceed` entries that slid
out of the recent window since the last event are scored by the distance-
weighted attention mass of the last (1 + recent) query rows and all but the
top-k are evicted. The reference carries, per layer, the full head-averaged
probability rows of the last (1 + recent) queries over the whole cache
(`recent_attn_weights`, :1075,1080-1081,1131) and physically rewrites
`key_cache`/`value_cache` (:1104-1127). Here the same selection runs over a
bounded rolling score buffer (rows = last recent+1 queries as a stamp ring,
columns = the last recent+1+exceed cache entries, the only ones that can ever
be candidates) and eviction is validity masking on the static cache — no
rewrite, no dynamic shapes. Columns are indexed directly by cache slot (full
cache width): when `past` lags far behind the current length — routine for
deep pyramid layers whose prefill cache is much shorter than layer 0's —
the reference triggers an event on EVERY decode step and the candidate band
walks arbitrarily deep into the cache, so no bounded rolling window of
recent entries can represent the candidate set. Buffer memory is
O(layers * recent * capacity) fp32, fine at the <=8K contexts the reference
harness runs PyramidInfer at (it is 8K-capped there for its own O(s^2)
eager-attention reasons, eval/run_longbench.py:117-119).
Conscious divergences (documented, golden-tested
under configs where they cannot bite): `recent_length` is frozen at its
prefill value (the reference recomputes int((n+step)*recent_ratio) per decode
step, :990, so it can grow by ~gen_len*ratio rows over a generation), and the
reference's if/if/else decay-strategy dispatch (:1085-1090), which makes
"linear" fall through to the constant ratio, is implemented as a proper
if/elif chain.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

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
    # reference adjusts min_context_length to the prompt (:991)
    min_ctx = min(mcfg.pyramid_min_context_length, bucket - 1 - recent_cap)
    lengths = [bucket]
    s = bucket
    for l in range(cfg.num_layers):
        r = decay_ratio(mcfg, l, cfg.num_layers)
        ctx = s - (1 + recent_cap)
        compresses = (l % mcfg.pyramid_downsample_interval) == 0
        if compresses and ctx > min_ctx and r < 1.0:
            topk = int(ctx * r)
            if topk <= min_ctx:
                topk = ctx
            new_s = min(round_up(topk + 1 + recent_cap, align), s)
        else:
            new_s = s
        s = new_s
        lengths.append(s)
    return lengths


def _rows_probs(
    q: jnp.ndarray,  # [b, H, s, d]
    k: jnp.ndarray,  # [b, KH, s, d]
    state: SeqState,
    row_idx: jnp.ndarray,  # [b, R]
    row_valid: jnp.ndarray,  # [b, R]
) -> jnp.ndarray:
    """Head-averaged causal softmax probs of the selected query rows.

    Returns p [b, R, s] fp32 (invalid rows all-zero). This is the O(R*s)
    windowed equivalent of the reference's eager full s*s attention probs
    (layer_outputs[1].mean(dim=1), pyramidinfer/llama_model.py:1050,1078)
    restricted to the rows the pyramid/gen logic actually consumes.
    """
    b, h, s, d = q.shape
    rows = row_idx.shape[1]
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
    return p.mean(axis=1)  # mean over heads -> [b, R, s]


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
    p = _rows_probs(q, k, state, row_idx, row_valid)  # [b, R, s]

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


class PyramidDecodeState(NamedTuple):
    """Rolling score state for generation-stage re-compression.

    Rows are a stamp-ring of the last `Rr = recent_cap + 1` query rows' head-
    averaged probs (the reference's `recent_attn_weights`, pyramidinfer/
    llama_model.py:1075,1131). Columns are cache slots: a row's prob at a slot
    that was appended after the row ran is zero by construction (the slot was
    invalid when its softmax ran), which reproduces the reference's zero-column
    padding of older rows (:1080); evicted slots simply stop being candidates.
    """

    probs: jnp.ndarray  # [L, b, Rr, cap] fp32
    row_stamp: jnp.ndarray  # [L, b, Rr] int32 (decode step stamp; -BIG = empty)
    past: jnp.ndarray  # [L, b] int32 — the reference's past_kv_seq_lens
    live: jnp.ndarray  # [L, b] int32 — live entry count per layer


_BIG = jnp.int32(2**30)


def decode_buffer_rows(mcfg: MethodConfig, bucket: int) -> int:
    """Score-buffer row count for one (method, bucket) pair."""
    return int(bucket * mcfg.pyramid_recent_ratio) + 1


def gen_decay_ratio(mcfg: MethodConfig, layer: int, num_layers: int) -> float:
    """Generation-stage decay schedule (reference :1085-1090; see module
    docstring for the if/elif fix vs the reference's fall-through)."""
    base = mcfg.pyramid_gen_decay_ratio
    if mcfg.pyramid_gen_decay_strategy == "linear":
        return (1.0 - base) * (layer / num_layers) + base
    if mcfg.pyramid_gen_decay_strategy == "cosine":
        return (1.0 - base) * (math.cos(math.pi * layer / num_layers) + 1) / 2 + base
    return base


def _seed_layer_state(
    mcfg: MethodConfig,
    q: jnp.ndarray,
    k: jnp.ndarray,
    state: SeqState,
    rr: int,
    cap_total: int,
):
    """Seed one layer's decode score-buffer from prefill.

    Mirrors `recent_attn_weights.append(attn_weights[:, -(1+recent):])` and
    `past_kv_seq_lens.append(<this layer's cache length>)` (reference
    :1072-1075): rows = the last rr valid prefill queries; columns = this
    layer's cache slots (the layer cache is its input K/V, front-aligned, so
    buffer column j is cache slot j; decode slots start zero).
    """
    b, _, s, _ = q.shape
    count = state.count
    row_idx, row_valid = selection.window_indices(count - rr, rr, count)
    p = _rows_probs(q, k, state, row_idx, row_valid)  # [b, rr, s]
    p = jnp.pad(p, ((0, 0), (0, 0), (0, cap_total - s)))
    # stamp of row i: 0 for the last prefill token, negative going back
    stamp = row_idx - (count - 1)[:, None]
    stamp = jnp.where(row_valid, stamp, -_BIG)
    # ring placement: ring index = stamp mod rr (distinct for the rr rows)
    ring = jnp.mod(row_idx - count[:, None] + 1, rr)
    biot = jnp.arange(b)[:, None]
    probs = jnp.zeros((b, rr, cap_total), jnp.float32).at[biot, ring].set(p)
    stamps = jnp.full((b, rr), -_BIG, jnp.int32).at[biot, ring].set(stamp)
    return probs, stamps


def prefill(
    params: Dict[str, Any],
    cfg: ModelConfig,
    mcfg: MethodConfig,
    ecfg: EngineConfig,
    shapes: PrefillShapes,
    tokens: jnp.ndarray,  # [b, bucket]
    n_true: jnp.ndarray,  # [b]
    want_decode_state: bool = False,
):
    """Pyramidal prefill. Cache capacity is uniform (= bucket + decode room);
    per-layer contents follow the pyramid (validity-masked). With
    `want_decode_state`, also seeds the generation-stage score buffers and
    returns (logits, cache, PyramidDecodeState)."""
    b, s0 = tokens.shape
    inv_freq = jnp.asarray(compute_inv_freq(cfg))
    lengths = plan_layer_lengths(cfg, mcfg, s0, ecfg.capacity_align)
    recent_cap = int(s0 * mcfg.pyramid_recent_ratio)
    recent_dyn = jnp.floor(n_true.astype(jnp.float32) * mcfg.pyramid_recent_ratio).astype(jnp.int32)
    rr = decode_buffer_rows(mcfg, s0)

    h = llama.embed(params, cfg, tokens)
    positions = jnp.broadcast_to(jnp.arange(s0, dtype=jnp.int32)[None, :], (b, s0))
    valid = positions < n_true[:, None]
    state = SeqState(h=h, positions=positions, valid=valid, count=n_true, n_orig=n_true)

    cache_layers = []
    seed_layers = []
    cap_total = shapes.total_capacity
    for l in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda x: x[l], params["layers"])
        hn = llama.rms_norm(state.h, lp["ln_attn"], cfg.rms_norm_eps)
        q, k, v = llama.qkv_proj(lp, cfg, hn)
        q, k = llama.rope_qk(q, k, state.positions, inv_freq)
        attn = _attend(cfg, q, k, v, state, ecfg.use_pallas)
        h = state.h + llama.attn_out_proj(lp, attn)
        h = h + llama.mlp(
            lp, llama.rms_norm(h, lp["ln_mlp"], cfg.rms_norm_eps),
            chunk=ecfg.mlp_chunk_for(h.shape[1]),
        )
        if want_decode_state:
            seed_layers.append(_seed_layer_state(mcfg, q, k, state, rr, cap_total))
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
            # reference adjusts min_context_length to the prompt (:991)
            min_ctx_dyn = jnp.minimum(
                mcfg.pyramid_min_context_length, n_true - 1 - recent_dyn
            )
            keep_all = (ctx_dyn <= min_ctx_dyn) | (topk_dyn <= min_ctx_dyn)
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
    if not want_decode_state:
        return logits, cache
    counts = cache.valid[:, :, 0, :].sum(axis=-1).astype(jnp.int32)  # [L, b]
    pstate = PyramidDecodeState(
        probs=jnp.stack([s[0] for s in seed_layers]),
        row_stamp=jnp.stack([s[1] for s in seed_layers]),
        past=counts,  # reference seeds past_kv_seq_lens with the FULL layer
        # length incl. the recent window (:1073); first event is late by ~recent
        live=counts,
    )
    return logits, cache, pstate


def _decode_attn_with_probs(
    q: jnp.ndarray,  # [b, H, 1, d]
    k_cache: jnp.ndarray,  # [b, KH, C, d]
    v_cache: jnp.ndarray,
    valid: jnp.ndarray,  # [b, KH, C]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode attention that also returns head-averaged probs [b, C] fp32
    (the reference consumes layer_outputs[1].mean(dim=1), :1078)."""
    b, H, _, d = q.shape
    kh = k_cache.shape[1]
    g = H // kh
    qg = q.reshape(b, kh, g, d)
    logits = jnp.einsum(
        "bcgd,bcsd->bcgs", qg, k_cache, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    logits = jnp.where(valid[:, :, None, :], logits, att.NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)  # [b, kh, g, C]
    out = jnp.einsum(
        "bcgs,bcsd->bcgd", p.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    ).reshape(b, H, 1, d).astype(q.dtype)
    return out, p.mean(axis=(1, 2))


def decode_step(
    params: Dict[str, Any],
    cfg: ModelConfig,
    mcfg: MethodConfig,
    cache: KVCache,
    pstate: PyramidDecodeState,
    token: jnp.ndarray,  # [b] int32
    pos: jnp.ndarray,  # [b] int32 original position
    slot: jnp.ndarray,  # int32 scalar (uniform) or [b] per-example cache slot
    stamp: jnp.ndarray,  # int32 scalar or [b] decode step stamp (1 = first)
    n_true: jnp.ndarray,  # [b]
    r_dyn: jnp.ndarray,  # [b] frozen recent length
) -> Tuple[jnp.ndarray, KVCache, PyramidDecodeState]:
    """One pyramid decode step: forward + score-buffer update + (conditional)
    generation-stage eviction per layer (reference :1076-1131).

    Per-example `slot`/`stamp` vectors serve the continuous-batching Scheduler,
    where each decode slot sits at a different depth (engine.scheduler); the
    Engine's scanned generation passes uniform scalars."""
    from fastkv_tpu.engine.decode import _dus_batch

    inv_freq = jnp.asarray(compute_inv_freq(cfg))
    b = token.shape[0]
    L = cfg.num_layers
    h = llama.embed(params, cfg, token[:, None])
    cap = cache.k.shape[3]
    ch = cache.k.shape[2]
    exceed = mcfg.pyramid_exceed_length_to_compress
    rr = pstate.probs.shape[2]
    zero = jnp.zeros((), jnp.int32)
    biot = jnp.arange(b)[:, None]
    per_example = getattr(slot, "ndim", 0) == 1
    # stamp is used batched everywhere below; a scalar broadcasts losslessly
    stamp = jnp.broadcast_to(jnp.asarray(stamp, jnp.int32), (b,))

    k_all, v_all, pos_all, valid_all = cache.k, cache.v, cache.pos, cache.valid
    probs_a, stamp_a = pstate.probs, pstate.row_stamp
    past_a, live_a = pstate.past, pstate.live
    pos_blk = jnp.broadcast_to(pos[:, None, None], (b, ch, 1)).astype(jnp.int32)

    def write(arr_all, li, upd):
        if per_example:
            layer = _dus_batch(arr_all[li], upd, slot.astype(jnp.int32))
            return arr_all.at[li].set(layer)
        idx = (jnp.int32(li), zero, zero, slot) + ((zero,) if upd.ndim == 4 else ())
        return jax.lax.dynamic_update_slice(arr_all, upd[None], idx)

    for l in range(L):
        lp = jax.tree_util.tree_map(lambda x: x[l], params["layers"])
        hn = llama.rms_norm(h, lp["ln_attn"], cfg.rms_norm_eps)
        q, k_new, v_new = llama.qkv_proj(lp, cfg, hn)
        q, k_new = llama.rope_qk(q, k_new, pos[:, None], inv_freq)
        k_all = write(k_all, l, k_new.astype(k_all.dtype))
        v_all = write(v_all, l, v_new.astype(v_all.dtype))
        pos_all = write(pos_all, l, pos_blk)
        valid_all = write(valid_all, l, jnp.ones((b, ch, 1), bool))
        attn, pm = _decode_attn_with_probs(q, k_all[l], v_all[l], valid_all[l])
        h = h + llama.attn_out_proj(lp, attn)
        h = h + llama.mlp(lp, llama.rms_norm(h, lp["ln_mlp"], cfg.rms_norm_eps))

        # ---- score-buffer update (reference :1080-1081,1131) ----
        # new row = this query's head-averaged probs over cache slots; rows'
        # probs at slots appended later are zero by construction
        ring = jnp.mod(stamp, rr)  # [b]
        brow = jnp.arange(b)
        probs_l = probs_a[l].at[brow, ring, :].set(pm)
        stamp_l = stamp_a[l].at[brow, ring].set(stamp)
        live_l = live_a[l] + 1

        # ---- generation-stage compression event (reference :1092-1129) ----
        past_l = past_a[l]
        trigger = (n_true + stamp - r_dyn - past_l) >= exceed  # [b]
        # candidate band: live entries ranked [R+2, R+1+exceed] from the end.
        # Entry order == slot order (prefill slots are front-aligned appends,
        # decode slots grow upward), so rank-from-end = reversed cumsum of
        # liveness over slots.
        live_slots = valid_all[l][:, 0, :]  # [b, cap]
        rank = jnp.cumsum(live_slots[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1]
        band = live_slots & (rank >= (r_dyn + 2)[:, None]) & (
            rank <= (r_dyn + 1 + exceed)[:, None]
        )
        # distance-weighted mean over the last (1 + recent) rows (:1093-1096)
        i_rank = stamp_l - (stamp - r_dyn)[:, None]
        row_ok = (i_rank >= 0) & (i_rank <= r_dyn[:, None])
        wrow = 1.0 + (mcfg.pyramid_distance_weight - 1.0) * (
            i_rank.astype(jnp.float32) / jnp.maximum(r_dyn, 1)[:, None].astype(jnp.float32)
        )
        wrow = jnp.where(row_ok, wrow, 0.0)
        scores = jnp.einsum("br,brc->bc", wrow, probs_l) / (
            (r_dyn + 1).astype(jnp.float32)[:, None]
        )
        k_keep = max(int(exceed * mcfg.pyramid_gen_compress_ratio
                         * gen_decay_ratio(mcfg, l, L)), 1)  # :1096-1098 (static)
        top_idx, top_val = selection.topk_select(
            scores[:, None, :], band, jnp.full((b,), k_keep, jnp.int32),
            min(k_keep, exceed),
        )
        keep = jnp.zeros((b, cap), bool).at[biot, top_idx[:, 0]].max(top_val[:, 0])
        evict = band & (~keep) & trigger[:, None]
        # invalidate evicted entries in the cache (masking, not rewrite)
        valid_all = valid_all.at[l].set(valid_all[l] & (~evict)[:, None, :])
        n_evict = jnp.sum(evict, axis=-1).astype(jnp.int32)
        live_l = live_l - n_evict
        past_l = jnp.where(trigger, live_l - r_dyn, past_l)  # :1128

        probs_a = probs_a.at[l].set(probs_l)
        stamp_a = stamp_a.at[l].set(stamp_l)
        past_a = past_a.at[l].set(past_l)
        live_a = live_a.at[l].set(live_l)

    new_cache = KVCache(k=k_all, v=v_all, pos=pos_all, valid=valid_all)
    new_state = PyramidDecodeState(
        probs=probs_a, row_stamp=stamp_a, past=past_a, live=live_a,
    )
    logits = llama.unembed(params, cfg, h)[:, 0, :]
    return logits, new_cache, new_state


def greedy_generate(
    params: Dict[str, Any],
    cfg: ModelConfig,
    mcfg: MethodConfig,
    shapes: PrefillShapes,
    first_logits: jnp.ndarray,  # [b, V]
    cache: KVCache,
    pstate: PyramidDecodeState,
    n_true: jnp.ndarray,  # [b]
    max_new_tokens: int,
    eos_ids=None,  # [E] int32 or None
    min_new_tokens: int = 1,
):
    """Greedy decoding with generation-stage re-compression (lax.scan).

    Mirrors fastkv_tpu.engine.decode.greedy_generate, with the pyramid score
    state threaded through the carry (the reference threads past_kv_seq_lens /
    recent_attn_weights through generate() kwargs, :1406-1452).
    """
    from fastkv_tpu.engine.decode import GenResult

    b = first_logits.shape[0]
    vocab = first_logits.shape[-1]
    eos_onehot = jnp.isin(jnp.arange(vocab), eos_ids) if eos_ids is not None else None
    r_dyn = jnp.floor(
        n_true.astype(jnp.float32) * mcfg.pyramid_recent_ratio
    ).astype(jnp.int32)

    def sample(logits, step):
        if eos_onehot is not None and min_new_tokens > 0:
            logits = jnp.where(
                (step < min_new_tokens) & eos_onehot[None, :], -jnp.inf, logits
            )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def is_eos(tok):
        if eos_ids is None:
            return jnp.zeros_like(tok, dtype=bool)
        return jnp.isin(tok, eos_ids)

    tok0 = sample(first_logits, 0)
    done0 = is_eos(tok0)

    def body(carry, step):
        cache, pstate, tok, done = carry
        pos = n_true + step
        slot = shapes.prefill_capacity + step
        logits, cache, pstate = decode_step(
            params, cfg, mcfg, cache, pstate, tok, pos, slot, step + 1, n_true, r_dyn
        )
        nxt = jnp.where(done, 0, sample(logits, step + 1))
        new_done = done | is_eos(nxt)
        return (cache, pstate, nxt, new_done), (nxt, done)

    steps = jnp.arange(max_new_tokens - 1, dtype=jnp.int32)
    (cache, pstate, _, _), (rest, done_before) = jax.lax.scan(
        body, (cache, pstate, tok0, done0), steps
    )
    toks = jnp.concatenate([tok0[:, None], rest.T], axis=1)
    alive = jnp.concatenate([jnp.ones((b, 1), bool), ~done_before.T], axis=1)
    toks = jnp.where(alive, toks, 0)
    num = jnp.sum(alive, axis=1).astype(jnp.int32)
    return GenResult(tokens=toks, num_generated=num), cache
