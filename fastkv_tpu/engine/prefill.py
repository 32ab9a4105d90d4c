"""Prefill: full-context attention + per-layer cache compression + TSP.

TPU-first architecture (vs the reference's per-layer Python mutation of a
DynamicCache, baselines/fastkv/llama_model.py:273-401):

  * The decoder runs as `lax.scan` over stacked layer params — O(1) compile in
    depth. FastKV's TSP layer is *unrolled out of the scan*: segment A scans
    layers [0, tsp_idx), the TSP layer runs explicitly (it both compresses its
    cache and emits the TSP keep-set), the token gather happens between
    segments, and segment B scans layers (tsp_idx, L) at the reduced static
    length. The reference mutates sequence length mid-loop
    (fastkv/llama_model.py:252-259,368-371); here each segment is shape-static,
    which is exactly what XLA wants — the post-TSP segment compiles for the
    smaller shape.
  * Budgets: static capacities from the bucketed length; traced per-example
    budgets drive validity masks (see fastkv_tpu.policies.budgets).
  * The AdaKV-style last-hidden-state cut-off (fastkv/llama_model.py:392,
    fullkv/llama_model.py:140-141) becomes a gather of the single last valid
    token before the LM head — the head only ever sees one token.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fastkv_tpu.cache.kv_cache import KVCache
from fastkv_tpu.core.config import (
    EngineConfig,
    Method,
    MethodConfig,
    ModelConfig,
    round_up,
)
from fastkv_tpu.models import llama
from fastkv_tpu.ops import attention as att
from fastkv_tpu.policies import budgets, methods, selection


@dataclasses.dataclass(frozen=True)
class PrefillShapes:
    """Static shape plan for one (method, bucket) pair."""

    bucket: int
    prefill_capacity: int  # kept-slot extent per layer (incl. window for scores)
    keep_capacity: int  # non-window top-k extent (score methods)
    tsp_capacity: int  # post-TSP sequence extent (fastkv; else = bucket)
    decode_capacity: int

    @property
    def total_capacity(self) -> int:
        return self.prefill_capacity + self.decode_capacity


def plan_shapes(
    cfg: ModelConfig, mcfg: MethodConfig, ecfg: EngineConfig, n_bucket: int
) -> PrefillShapes:
    align = ecfg.capacity_align
    decode_cap = round_up(ecfg.max_new_tokens, align)
    m = mcfg.method

    def finish(shapes: PrefillShapes) -> PrefillShapes:
        """Align TOTAL cache capacity to the Pallas decode kernel's block so
        decode_attention never pads (a pad would copy the whole cache every
        step — measured 2x decode slowdown). Extra tail slots are invalid-
        masked; the only cost is streaming them (<= one block per layer)."""
        if not ecfg.decode_pallas:
            return shapes
        total = shapes.prefill_capacity + shapes.decode_capacity
        a = 1024 if total < 32768 else 2048
        extra = (-total) % a
        if extra:
            shapes = dataclasses.replace(
                shapes, decode_capacity=shapes.decode_capacity + extra
            )
        return shapes

    if m in (Method.FULLKV, Method.GEMFILTER, Method.PYRAMIDINFER):
        # pyramidinfer: per-layer contents shrink with depth but share one
        # uniform (validity-masked) capacity so layers stack
        return finish(
            PrefillShapes(n_bucket, n_bucket, n_bucket, n_bucket, decode_cap)
        )
    if m == Method.STREAMINGLLM:
        if mcfg.eviction_mode == "proportional":
            cap = int(n_bucket * mcfg.retain_rate)
        else:
            cap = mcfg.max_capacity_prompt
        cap = min(round_up(max(cap, 8), align), n_bucket)
        return finish(PrefillShapes(n_bucket, cap, cap, n_bucket, decode_cap))
    # score-based: fastkv / snapkv / h2o (pyramidinfer has its own planner)
    bud_a = budgets.static_prefill_budget(mcfg, n_bucket, is_post_tsp=False, align=align)
    keep_cap = bud_a.keep_capacity
    tsp_cap = n_bucket
    if m == Method.FASTKV:
        tsp_cap = bud_a.tsp_capacity
        bud_b = budgets.static_prefill_budget(mcfg, tsp_cap, is_post_tsp=True, align=align)
        keep_cap = max(keep_cap, bud_b.keep_capacity)
    prefill_cap = min(keep_cap + mcfg.window_size, n_bucket)
    return finish(
        PrefillShapes(n_bucket, prefill_cap, keep_cap, tsp_cap, decode_cap)
    )


class SeqState(NamedTuple):
    """The running sequence of one prefill segment."""

    h: jnp.ndarray  # [b, s, D]
    positions: jnp.ndarray  # [b, s] original position ids (invalid slots: 0)
    valid: jnp.ndarray  # [b, s]
    count: jnp.ndarray  # [b] number of valid tokens in this layout
    n_orig: jnp.ndarray  # [b] original true prompt length (window anchor)


def _mask_positions(cfg: ModelConfig, state: SeqState) -> jnp.ndarray:
    """Positions used for attention MASKING (RoPE always uses the original
    positions). With a sliding window, the window distance is measured in
    layout indices, matching the reference: post-TSP it hands flash-attn the
    gathered sequence contiguously, so SWA counts cache entries, not original
    positions (baselines/fastkv/mistral_model.py:72-98 + its flash call). For
    valid-prefix ascending layouts, index-causality == position-causality, so
    this changes only the window term."""
    if cfg.sliding_window is None:
        return state.positions
    b, s = state.positions.shape
    return jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))


def _attend(
    cfg: ModelConfig,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    state: SeqState,
    use_pallas: bool,
) -> jnp.ndarray:
    mpos = _mask_positions(cfg, state)
    if use_pallas:
        from fastkv_tpu.ops import flash_prefill

        # NOTE: the kernel's pure-causal fast path leaves finite garbage in
        # rows that see zero visible keys (only possible for INVALID rows —
        # padded rows in post-TSP segment B layouts); every consumer of the
        # attention output downstream masks by state.valid (tsp_gather,
        # _gather_cache, the last-valid-token unembed), so the garbage never
        # reaches a result. See the invariant comment in flash_prefill.py.
        return flash_prefill.flash_attention(
            q, k, v, mpos, state.count, sliding_window=cfg.sliding_window
        )
    return att.chunked_causal_attention(
        q, k, v, mpos, mpos, state.valid,
        sliding_window=cfg.sliding_window,
    )


def _window_rows(
    q: jnp.ndarray, state: SeqState, window_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather the observation-window query rows (last W valid tokens).

    Returns (q_win [b, H, W, d], win_idx [b, W], win_valid [b, W])."""
    win_idx, win_valid = selection.window_indices(
        state.count - window_size, window_size, state.count
    )
    q_win = jnp.take_along_axis(q, win_idx[:, None, :, None], axis=2)
    return q_win, win_idx, win_valid


def _window_scores(
    q_win: jnp.ndarray,
    k: jnp.ndarray,
    win_idx: jnp.ndarray,
    win_valid: jnp.ndarray,
    state: SeqState,
    window_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact SnapKV/FastKV observation scores in O(W·s) memory.

    The reference recomputes a W×s QK^T with full-row fp32 softmax
    (fastkv/utils.py:94-104); because every non-window key is causally visible
    to every window query, that equals the true causal softmax of the last W
    rows. Columns inside the window or invalid get score 0.

    Returns (scores [b, H, s] fp32, selectable [b, s])."""
    b, h, w, d = q_win.shape
    kh = k.shape[1]
    g = h // kh
    qg = q_win.reshape(b, kh, g, w, d)
    logits = jnp.einsum(
        "bkgwd,bksd->bkgws", qg, k, preferred_element_type=jnp.float32
    ).reshape(b, h, w, -1) * (d**-0.5)
    qw_pos = jnp.take_along_axis(state.positions, win_idx, axis=1)  # [b, W]
    attend = (state.positions[:, None, :] <= qw_pos[:, :, None]) & state.valid[:, None, :]
    attend = attend & win_valid[:, :, None]
    logits = jnp.where(attend[:, None, :, :], logits, att.NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = jnp.where(win_valid[:, None, :, None], p, 0.0)
    scores = jnp.sum(p, axis=-2)  # [b, H, s]
    col_in_window = state.positions >= (state.n_orig[:, None] - window_size)
    selectable = state.valid & (~col_in_window)
    return jnp.where(selectable[:, None, :], scores, 0.0), selectable


def _keep_set_for_layer(
    cfg: ModelConfig,
    mcfg: MethodConfig,
    shapes: PrefillShapes,
    state: SeqState,
    q: jnp.ndarray,
    k: jnp.ndarray,
    is_post_tsp: bool,
    precomputed_scores=None,  # (raw, selectable, win_idx, win_valid) from the
    #   fused Pallas kernel (flash_prefill window_q path); skips the XLA pass
) -> Tuple[methods.KeepSet, Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]]]:
    """Compute this layer's cache keep-set. Also returns the raw window-score
    context (scores, selectable, win_idx, win_valid) for TSP reuse at the TSP
    layer (the reference derives tsp_indices from the same attn_cache tensor,
    fastkv/utils.py:112-130)."""
    m = mcfg.method
    b = q.shape[0]
    ch = methods.cache_heads(m, cfg)
    if m == Method.FULLKV or m == Method.GEMFILTER:
        ks = methods.fullkv_keep(ch, b, shapes.prefill_capacity, state.count)
        return ks, None
    if m == Method.STREAMINGLLM:
        ks = methods.streamingllm_keep(mcfg, ch, b, state.count, shapes.prefill_capacity)
        return ks, None
    k_budget = budgets.dynamic_keep_budget(mcfg, state.count, is_post_tsp)
    if precomputed_scores is not None:
        raw, selectable, win_idx, win_valid = precomputed_scores
    elif m == Method.H2O:
        raw = att.h2o_scores(q, k, state.valid, state.n_orig, mcfg.window_size)
        col_in_window = state.positions >= (state.n_orig[:, None] - mcfg.window_size)
        selectable = state.valid & (~col_in_window)
        _, win_idx, win_valid = _window_rows(q, state, mcfg.window_size)
    else:
        q_win, win_idx, win_valid = _window_rows(q, state, mcfg.window_size)
        raw, selectable = _window_scores(
            q_win, k, win_idx, win_valid, state, mcfg.window_size
        )
    ks = methods.score_based_keep(
        m, mcfg, cfg, raw, selectable, win_idx, win_valid, k_budget, shapes.keep_capacity
    )
    return ks, (raw, selectable, win_idx, win_valid)


def _gather_cache(
    cfg: ModelConfig,
    method: Method,
    k: jnp.ndarray,  # [b, KH, s, d]
    v: jnp.ndarray,
    state: SeqState,
    keep: methods.KeepSet,
    decode_capacity: int,
    kv_int8: bool = False,
):
    """Gather kept K/V/pos into one layer's cache arrays (+ decode headroom).

    With kv_int8, K/V are stored int8 with per-(head, slot) scales appended
    to the returned tuple (core.quant.quantize_kv)."""
    b, kh, s, d = k.shape
    ch = keep.idx.shape[1]
    if ch == kh:
        ksrc, vsrc = k, v
    else:  # per-query-head cache (snapkv/h2o): repeat kv heads (reference
        # repeat_kv before update, snapkv/llama_model.py:385)
        g = ch // kh
        ksrc = jnp.repeat(k, g, axis=1)
        vsrc = jnp.repeat(v, g, axis=1)
    k_kept = selection.gather_tokens(ksrc, keep.idx)
    v_kept = selection.gather_tokens(vsrc, keep.idx)
    pos_b = jnp.broadcast_to(state.positions[:, None, :], (b, ch, s))
    pos_kept = jnp.take_along_axis(pos_b, keep.idx, axis=2)
    k_kept = jnp.where(keep.valid[..., None], k_kept, 0)
    v_kept = jnp.where(keep.valid[..., None], v_kept, 0)
    pos_kept = jnp.where(keep.valid, pos_kept, 0)
    pad_kv = ((0, 0), (0, 0), (0, decode_capacity), (0, 0))
    pad_m = ((0, 0), (0, 0), (0, decode_capacity))
    parts = []
    if kv_int8:
        from fastkv_tpu.core import quant

        k_kept, k_sc = quant.quantize_kv(k_kept)
        v_kept, v_sc = quant.quantize_kv(v_kept)
        parts = [jnp.pad(k_sc, pad_m), jnp.pad(v_sc, pad_m)]
    return (
        jnp.pad(k_kept, pad_kv),
        jnp.pad(v_kept, pad_kv),
        jnp.pad(pos_kept, pad_m),
        jnp.pad(keep.valid, pad_m),
        *parts,
    )


def make_layer_fn(
    cfg: ModelConfig,
    mcfg: MethodConfig,
    ecfg: EngineConfig,
    shapes: PrefillShapes,
    is_post_tsp: bool,
    want_tsp: bool = False,
    sp_attend=None,  # SP attention callable (ring/ulysses, see sp_attend_fn);
    #   when set, hidden/positions stay sequence-sharded through the layer and
    #   attention runs under shard_map over the 'seq' mesh axis
):
    """Build the per-layer prefill body (used unrolled or under lax.scan)."""

    from fastkv_tpu.models.rope import compute_inv_freq

    inv_freq = jnp.asarray(compute_inv_freq(cfg))

    # fastkv/snapkv under Pallas: the observation-window scoring fuses into the
    # flash kernel (keys stream through VMEM once for attention AND scoring),
    # replacing the separate O(W*s) XLA pass + K re-read. Under SP the kernel
    # is per-shard, so scoring goes through the XLA pass (whose softmax-over-s
    # reductions the partitioner turns into seq-axis collectives: local scores
    # -> psum -> global top-k, SURVEY.md §5 'Long-context'). Beyond ~106K the
    # strip scratch no longer fits scoped VMEM at full attention blocks and
    # fusing would cost more than it saves (flash_prefill.fusion_vmem_ok) —
    # fall back to the XLA pass there.
    seg_len = shapes.tsp_capacity if is_post_tsp else shapes.bucket
    fused_scores = (
        ecfg.use_pallas
        and ecfg.fuse_window_scores
        and sp_attend is None
        and mcfg.method in (Method.FASTKV, Method.SNAPKV)
    )
    if fused_scores:
        from fastkv_tpu.ops.flash_prefill import fusion_vmem_ok

        fused_scores = fusion_vmem_ok(seg_len, mcfg.window_size)

    def layer_fn(state: SeqState, lp: Dict[str, jnp.ndarray]):
        h = state.h
        hn = llama.rms_norm(h, lp["ln_attn"], cfg.rms_norm_eps)
        q, k, v = llama.qkv_proj(lp, cfg, hn)
        q, k = llama.rope_qk(q, k, state.positions, inv_freq)
        precomputed = None
        if sp_attend is not None:
            attn = sp_attend(q, k, v, state)
        elif fused_scores:
            from fastkv_tpu.ops import flash_prefill

            q_win, win_idx, win_valid = _window_rows(q, state, mcfg.window_size)
            # Masking positions, NOT raw original positions: with a sliding
            # window the distance must be measured in layout indices (see
            # _mask_positions) or post-TSP far-past selected tokens would be
            # wrongly windowed out. For ascending valid-prefix layouts
            # index-causality == position-causality, so the strip scores and
            # the causal mask are unchanged when sliding_window is None
            # (mpos == state.positions there).
            fmpos = _mask_positions(cfg, state)
            qw_pos = jnp.take_along_axis(fmpos, win_idx, axis=1)
            qw_pos = jnp.where(win_valid, qw_pos, -1)
            attn, raw = flash_prefill.flash_attention(
                q, k, v, fmpos, state.count,
                sliding_window=cfg.sliding_window,
                window_q=q_win, window_q_pos=qw_pos,
            )
            col_in_window = state.positions >= (state.n_orig[:, None] - mcfg.window_size)
            selectable = state.valid & (~col_in_window)
            raw = jnp.where(selectable[:, None, :], raw, 0.0)
            precomputed = (raw, selectable, win_idx, win_valid)
        else:
            attn = _attend(cfg, q, k, v, state, ecfg.use_pallas)
        h = h + llama.attn_out_proj(lp, attn)
        h = h + llama.mlp(
            lp, llama.rms_norm(h, lp["ln_mlp"], cfg.rms_norm_eps),
            chunk=ecfg.mlp_chunk_for(h.shape[1]),
        )

        keep, score_ctx = _keep_set_for_layer(
            cfg, mcfg, shapes, state, q, k, is_post_tsp,
            precomputed_scores=precomputed,
        )
        cache_layer = _gather_cache(
            cfg, mcfg.method, k, v, state, keep, shapes.decode_capacity,
            kv_int8=ecfg.kv_int8,
        )
        new_state = state._replace(h=h)
        tsp_out = None
        if want_tsp:
            raw, selectable, win_idx, win_valid = score_ctx
            tsp_budget = budgets.dynamic_tsp_budget(mcfg, state.count)
            tsp_out = methods.fastkv_tsp_set(
                mcfg, cfg, raw, selectable, win_idx, win_valid,
                tsp_budget, shapes.tsp_capacity,
            )
        return new_state, cache_layer, tsp_out

    return layer_fn


def scan_segment(layer_fn, state: SeqState, layer_params, lo=None, hi=None):
    """lax.scan of layer_fn over a [lo, hi) slice of the stacked layer params.

    Scans over layer INDICES and dynamic-indexes the full stacked arrays
    inside the body, rather than scanning over pre-sliced pytrees: XLA
    materializes `x[lo:hi]` scan inputs as contiguous HLO-temp COPIES, which
    at 8B scale is ~2.3 GB of duplicated weights PER SEGMENT (observed: the
    131072-ctx 8B prefill OOMed by ~1 GB with s8[15,4096,14336] slice temps
    as the #5-7 allocations). Indexing the original buffer per iteration
    reads the same bytes with zero copies. Stacks cache outputs as before."""
    if lo is None:
        lo, hi = 0, jax.tree_util.tree_leaves(layer_params)[0].shape[0]

    def body(carry, i):
        lp = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
            layer_params,
        )
        new_state, cache_layer, _ = layer_fn(carry, lp)
        return new_state, cache_layer

    return jax.lax.scan(body, state, jnp.arange(lo, hi, dtype=jnp.int32))


def tsp_gather(state: SeqState, tsp: methods.TspSet) -> SeqState:
    """Between-segment token gather (reference: fastkv/llama_model.py:252-259 —
    gather hidden states AND position ids by the sorted TSP indices; RoPE for
    later layers is re-derived from the gathered original positions)."""
    h = selection.gather_tokens(state.h, tsp.idx)
    pos = jnp.take_along_axis(state.positions, tsp.idx, axis=1)
    pos = jnp.where(tsp.valid, pos, 0)
    h = jnp.where(tsp.valid[:, :, None], h, 0)
    count = jnp.sum(tsp.valid, axis=-1).astype(jnp.int32)
    return SeqState(h=h, positions=pos, valid=tsp.valid, count=count, n_orig=state.n_orig)


def sp_attend_fn(cfg: ModelConfig, ecfg: EngineConfig, pcfg, mesh):
    """Build the sequence-parallel attention callable for the prefill layers.

    'ring': blockwise ring attention — K/V chunks rotate over the 'seq' mesh
    axis via ppermute, partials merge by online-softmax stats. 'ulysses':
    all_to_all reshards seq->heads, plain causal attention, reshard back.
    (parallel/ring_attention.py; SURVEY.md §2.4.)
    """
    from fastkv_tpu.parallel import ring_attention as ra

    if pcfg.sp_mode == "ring":
        fn = ra.make_ring_attention(
            mesh, sliding_window=cfg.sliding_window, use_pallas=ecfg.use_pallas
        )

        def attend(q, k, v, state: SeqState):
            return fn(q, k, v, state.positions, state.count)

    elif pcfg.sp_mode == "ulysses":
        fn = ra.make_ulysses_attention(
            mesh, sliding_window=cfg.sliding_window, use_pallas=ecfg.use_pallas
        )

        def attend(q, k, v, state: SeqState):
            # ulysses consumes globally-replicated positions
            return fn(q, k, v, state.positions, state.count)

    else:
        raise ValueError(f"unknown sp_mode {pcfg.sp_mode}")
    return attend


def _seq_sharded(mesh, x, spec):
    from jax.sharding import NamedSharding

    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def prefill(
    params: Dict[str, Any],
    cfg: ModelConfig,
    mcfg: MethodConfig,
    ecfg: EngineConfig,
    shapes: PrefillShapes,
    tokens: jnp.ndarray,  # [b, bucket] right-padded
    n_true: jnp.ndarray,  # [b]
    pcfg=None,  # Optional[ParallelConfig]: sp_mode != 'none' shards the
    #   sequence axis of the long pre-TSP segment over the 'seq' mesh axis
    mesh=None,  # required when pcfg.sp_mode != 'none'
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the full prefill; returns (last-token logits [b, V] fp32, cache)."""
    if mcfg.method == Method.PYRAMIDINFER:
        from fastkv_tpu.engine import pyramid

        return pyramid.prefill(params, cfg, mcfg, ecfg, shapes, tokens, n_true)
    sp = pcfg is not None and getattr(pcfg, "sp_mode", "none") != "none" and pcfg.seq > 1
    b, s = tokens.shape
    assert s == shapes.bucket
    h = llama.embed(params, cfg, tokens)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    valid = positions < n_true[:, None]
    sp_attend = None
    if sp:
        from jax.sharding import PartitionSpec as P

        assert mesh is not None, "SP prefill needs the mesh"
        sp_attend = sp_attend_fn(cfg, ecfg, pcfg, mesh)
        # activations/positions sequence-sharded through the long segment;
        # score softmax + top-k reductions over 's' become seq-axis
        # collectives inserted by the SPMD partitioner (distributed TSP top-k)
        h = _seq_sharded(mesh, h, P("data", "seq", None))
        positions = _seq_sharded(mesh, positions, P("data", "seq"))
        valid = _seq_sharded(mesh, valid, P("data", "seq"))
    state = SeqState(h=h, positions=positions, valid=valid, count=n_true, n_orig=n_true)

    L = cfg.num_layers
    lay = params["layers"]
    if mcfg.method == Method.FASTKV:
        t = mcfg.tsp_idx
        fn_a = make_layer_fn(cfg, mcfg, ecfg, shapes, is_post_tsp=False, sp_attend=sp_attend)
        state, cache_a = scan_segment(fn_a, state, lay, 0, t)
        fn_t = make_layer_fn(
            cfg, mcfg, ecfg, shapes, is_post_tsp=False, want_tsp=True, sp_attend=sp_attend
        )
        lp_t = jax.tree_util.tree_map(lambda x: x[t], lay)
        state, cache_t, tsp = fn_t(state, lp_t)
        cache_t = jax.tree_util.tree_map(lambda x: x[None], cache_t)
        state = tsp_gather(state, tsp)
        if sp:
            # the post-TSP sequence (tsp_rate * s tokens) is short: run it
            # dense — gather output replicated over 'seq'
            from jax.sharding import PartitionSpec as P

            state = state._replace(
                h=_seq_sharded(mesh, state.h, P("data", None, None)),
                positions=_seq_sharded(mesh, state.positions, P("data", None)),
                valid=_seq_sharded(mesh, state.valid, P("data", None)),
            )
        fn_b = make_layer_fn(cfg, mcfg, ecfg, shapes, is_post_tsp=True)
        state, cache_b = scan_segment(fn_b, state, lay, t + 1, L)
        cache_parts = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), cache_a, cache_t, cache_b
        )
    else:
        fn = make_layer_fn(cfg, mcfg, ecfg, shapes, is_post_tsp=False, sp_attend=sp_attend)
        state, cache_parts = scan_segment(fn, state, lay)

    cache = KVCache(*cache_parts)
    if pcfg is not None and getattr(pcfg, "pipe", 1) > 1 and mesh is not None:
        # PP: keep the cache stage-local (layer axis sharded over 'pipe') so
        # a 70B-class cache never materializes on one stage; decode carries
        # the sharding forward (parallel/sharding.py param_pspecs docstring)
        from jax.sharding import NamedSharding

        from fastkv_tpu.parallel.sharding import cache_pspec

        spec = cache_pspec(quantized=cache.k_scale is not None)
        cache = KVCache(*(
            jax.lax.with_sharding_constraint(x, NamedSharding(mesh, s))
            if x is not None else None
            for x, s in zip(cache, spec)
        ))

    # AdaKV-style cut-off: LM head on the single last valid token
    last_idx = jnp.maximum(state.count - 1, 0)[:, None]
    h_last = selection.gather_tokens(state.h, last_idx)  # [b, 1, D]
    logits = llama.unembed(params, cfg, h_last)[:, 0, :]  # [b, V]
    return logits, cache
