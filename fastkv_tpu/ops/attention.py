"""Pure-XLA attention ops (reference path) + score computations for eviction.

These are the correctness-reference implementations; `fastkv_tpu.ops.flash_prefill`
and `fastkv_tpu.ops.experimental.decode_attn` provide the Pallas-accelerated equivalents and are
tested against these. Replaces the reference's external flash-attn CUDA kernels
(reference: baselines/fastkv/llama_model.py:8,79-81) and the separate
observation-window QK^T pass (reference: baselines/fastkv/utils.py:94-104).

Conventions:
  q:   [b, num_heads, s_q, d]
  k,v: [b, cache_heads, s_k, d]   cache_heads ∈ {num_kv_heads, num_heads}
  positions: original token position ids (TSP keeps original positions)
  softmax in fp32 (reference: fastkv/utils.py:103 softmaxes in fp32 under fp16)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _grouped_qk(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """QK^T with GQA grouping. Returns [b, num_heads, s_q, s_k] fp32 logits."""
    b, h, sq, d = q.shape
    kh = k.shape[1]
    g = h // kh
    qg = q.reshape(b, kh, g, sq, d)
    logits = jnp.einsum(
        "bkgqd,bksd->bkgqs", qg, k, preferred_element_type=jnp.float32
    )
    return logits.reshape(b, h, sq, k.shape[2])


def _grouped_pv(p: jnp.ndarray, v: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """probs @ V with GQA grouping. p: [b, h, s_q, s_k] fp32 -> [b, h, s_q, d]."""
    b, h, sq, sk = p.shape
    kh = v.shape[1]
    g = h // kh
    pg = p.reshape(b, kh, g, sq, sk)
    out = jnp.einsum(
        "bkgqs,bksd->bkgqd", pg.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(b, h, sq, v.shape[3]).astype(out_dtype)


def masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Softmax attention with an explicit boolean mask [b, 1|h, s_q, s_k].

    True = attend. fp32 softmax. Rows that are fully masked produce zeros.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = _grouped_qk(q, k) * scale
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - jax.lax.stop_gradient(m))
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-30)
    # fully-masked rows: zero output
    p = jnp.where(jnp.any(mask, axis=-1, keepdims=True), p, 0.0)
    return _grouped_pv(p, v, q.dtype)


def causal_mask_from_positions(
    q_pos: jnp.ndarray,
    k_pos: jnp.ndarray,
    k_valid: jnp.ndarray,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Causal + validity (+ sliding window) mask from original position ids.

    q_pos: [b, s_q]; k_pos: [b, s_k]; k_valid: [b, s_k] bool.
    Token-selected sequences carry original (non-contiguous) position ids, so
    causality is defined on positions, not indices.
    """
    qp = q_pos[:, :, None]
    kp = k_pos[:, None, :]
    mask = (kp <= qp) & k_valid[:, None, :]
    if sliding_window is not None:
        mask = mask & (kp > qp - sliding_window)
    return mask[:, None, :, :]


def window_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    q_pos: jnp.ndarray,
    k_pos: jnp.ndarray,
    k_valid: jnp.ndarray,
    n_true: jnp.ndarray,
    window_size: int,
    sum_over_groups: bool,
) -> jnp.ndarray:
    """SnapKV/FastKV observation-window attention-mass scores.

    Computes, for each key position outside the observation window, the column sum
    over the last `window_size` queries of the *causal softmax* probabilities
    (reference: baselines/fastkv/utils.py:94-104 and baselines/snapkv/utils.py:72-82;
    the reference's in-window triangular mask + full-row softmax is exactly the true
    causal softmax of the last W rows, because every non-window key is visible to
    every window query).

    Static-shape formulation: rather than slicing q[..., -W:, :] (dynamic under
    padding), all rows are computed and rows outside the window are zeroed before
    the column sum. Cost is one extra O(s^2 d) pass over an already-computed tensor
    shape; the Pallas path (ops/window_scores_kernel) streams it in O(W s d).

    Returns scores [b, num_heads, s_k] fp32 if sum_over_groups=False, else summed
    over GQA groups *after* pooling is NOT applied here — pooling and group-sum
    order is policy-specific and handled in fastkv_tpu.policies.
    Window columns and invalid columns get score 0.
    """
    del sum_over_groups  # reduction order handled by the policy layer
    b, h, sq, d = q.shape
    scale = d**-0.5
    logits = _grouped_qk(q, k) * scale  # [b, h, sq, sk]
    attend = causal_mask_from_positions(q_pos, k_pos, k_valid)  # [b,1,sq,sk]
    logits = jnp.where(attend, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    # rows in the observation window: original position in [n_true - W, n_true)
    # (upper bound excludes bucket-padding rows, whose sentinel positions are huge)
    row_in_window = (
        (q_pos >= (n_true[:, None] - window_size)) & (q_pos < n_true[:, None])
    )[:, None, :, None]
    p = jnp.where(row_in_window, p, 0.0)
    scores = jnp.sum(p, axis=-2)  # [b, h, sk] column sums over window rows
    # zero out window columns and invalid columns (reference sums cols [0, s-W))
    col_in_window = k_pos >= (n_true[:, None] - window_size)
    col_ok = k_valid & (~col_in_window)
    return jnp.where(col_ok[:, None, :], scores, 0.0)


def h2o_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    k_valid: jnp.ndarray,
    n_true: jnp.ndarray,
    window_size: int,
    row_block: int = 2048,
    pad_to: Optional[int] = None,
) -> jnp.ndarray:
    """H2O accumulated attention mass, chunked to O(s) memory.

    Reference semantics (baselines/h2o/utils.py:64-74): the full s x s QK^T is
    softmaxed with *only* the window-corner triangular mask applied (rows outside
    the last W are softmaxed over ALL columns, non-causally), then columns outside
    the window are summed over all rows. We reproduce those exact semantics —
    including the non-causal rows — but stream over row blocks so 128K context
    never materializes s^2 (the reference caps H2O at 8K for this reason,
    eval/run_longbench.py:117-119).

    The s=8192 bucket shape hits an XLA/Mosaic schedule pathology on v5e:
    measured 801 ms there for EVERY row_block in {512..4096} and every n,
    vs 31 ms at s=4096, 166 ms at s=16384 and 588 ms at s=32768
    (scripts/probe_h2o_8k.py; ROOFLINE.md §9) — ~30x off the logit-traffic
    bound, at exactly the reference's canonical H2O operating point (capped
    at 7950 tokens -> bucket 8192). Workaround: compute in a 16384-wide
    padded shape (rows beyond sq are masked queries, columns beyond sk are
    invalid keys — both contribute exactly 0 mass) and slice back. 2x the
    nominal column work, 4.8x faster wall clock. `pad_to` overrides the
    automatic s==8192 gate (0 disables).

    Returns scores [b, h, s_k] fp32; invalid/query-padding rows contribute 0.
    """
    b, h, sq, d = q.shape
    scale = d**-0.5
    sk = k.shape[2]
    if pad_to is None and sk == 8192 and sq == 8192:
        pad_to = 16384
    if pad_to and pad_to > sk:
        extra = pad_to - sk
        out = h2o_scores(
            jnp.pad(q, ((0, 0), (0, 0), (0, extra), (0, 0))),
            jnp.pad(k, ((0, 0), (0, 0), (0, extra), (0, 0))),
            jnp.pad(k_valid, ((0, 0), (0, extra))),
            n_true, window_size, row_block, pad_to=0,
        )
        return out[..., :sk]
    num_blocks = (sq + row_block - 1) // row_block
    pad = num_blocks * row_block - sq
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    qb = q.reshape(b, h, num_blocks, row_block, d).transpose(2, 0, 1, 3, 4)
    row_idx0 = jnp.arange(num_blocks) * row_block

    col_pos = jnp.arange(sk)[None, :]  # index-based: h2o runs pre-TSP layouts
    col_in_window = col_pos >= (n_true[:, None] - window_size)
    col_keep = k_valid & (~col_in_window)  # [b, sk]

    def body(carry, inp):
        acc = carry
        qblk, r0 = inp
        logits = _grouped_qk(qblk, k) * scale  # [b,h,rb,sk]
        rows = r0 + jnp.arange(row_block)  # global row indices
        rp = rows[None, :]  # [1, rb]
        # window-corner triangular mask: only applied when BOTH row and col are in
        # the last W of the true sequence: col position > row position is masked.
        row_in_window = rp >= (n_true[:, None] - window_size)  # [b, rb]
        corner = row_in_window[:, :, None] & col_in_window[:, None, :]
        illegal = corner & (col_pos[:, None, :] > rp[:, :, None])
        # invalid columns (bucket padding) never receive probability mass
        bad = illegal | (~k_valid)[:, None, :]
        lg = jnp.where(bad[:, None, :, :], NEG_INF, logits)
        m = jnp.max(lg, axis=-1, keepdims=True)
        e = jnp.exp(lg - m)
        p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        # rows beyond the true length are query padding: contribute nothing
        row_ok = (rp < n_true[:, None])[:, None, :, None]
        p = jnp.where(row_ok, p, 0.0)
        acc = acc + jnp.sum(p, axis=-2)
        return acc, None

    acc0 = jnp.zeros((b, h, sk), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (qb, row_idx0))
    return jnp.where(col_keep[:, None, :], acc, 0.0)


def chunked_causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_pos: jnp.ndarray,
    k_pos: jnp.ndarray,
    k_valid: jnp.ndarray,
    sliding_window: Optional[int] = None,
    q_block: Optional[int] = None,
) -> jnp.ndarray:
    """Flash-style causal attention in pure XLA: O(s * q_block) memory.

    Scans over query blocks; each block computes its full row of logits against
    all keys (masked), with fp32 softmax. This is the everywhere-correct fallback
    and the correctness reference for the Pallas flash kernel
    (fastkv_tpu.ops.flash_prefill). Equivalent to the reference's
    flash_attn_func prefill call (baselines/fastkv/llama_model.py:181-183).
    """
    b, h, sq, d = q.shape
    if q_block is None:
        # cap the fp32 logits block [b, h, qb, s] near 512 MB
        budget = 512 * 1024 * 1024 // (max(b * h * sq, 1) * 4)
        q_block = max(128, min(1024, budget))
    scale = d**-0.5
    nb = (sq + q_block - 1) // q_block
    pad = nb * q_block - sq
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q_pos = jnp.pad(q_pos, ((0, 0), (0, pad)), constant_values=2**30)
    qb = q.reshape(b, h, nb, q_block, d).transpose(2, 0, 1, 3, 4)
    qpb = q_pos.reshape(b, nb, q_block).transpose(1, 0, 2)

    def body(_, inp):
        qblk, qpblk = inp
        mask = causal_mask_from_positions(qpblk, k_pos, k_valid, sliding_window)
        out = masked_attention(qblk, k, v, mask)
        return None, out

    _, outs = jax.lax.scan(body, None, (qb, qpb))
    out = outs.transpose(1, 2, 0, 3, 4).reshape(b, h, nb * q_block, d)
    return out[:, :, :sq, :]


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    valid: jnp.ndarray,
    q_pos: Optional[jnp.ndarray] = None,
    k_pos: Optional[jnp.ndarray] = None,
    sliding_window: Optional[int] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Single-token decode attention over the compressed cache (XLA path).

    q: [b, H, 1, d]; k_cache/v_cache: [b, CH, C, d]; valid: [b, C] or [b, CH, C].
    CH may be num_kv_heads (GQA grouping) or num_heads (per-head caches, the
    reference SnapKV/H2O layout). Causality is implied: every valid cache entry
    precedes the query. Pallas variant (experimental, measured slower): fastkv_tpu.ops.experimental.decode_attn.

    int8 cache (k_scale/v_scale [b, CH, C] fp32, core.quant.quantize_kv): the
    per-slot scales FOLD into the math — K scales multiply logit columns
    (q·(k*s) == (q·k)*s), V scales fold into the softmax probabilities
    ((p*s)·v == p·(v*s)) — so the int8 tensors go straight into the dots and
    no dequantized [C, d] copy ever exists.
    """
    b, H, _, d = q.shape
    ch = k_cache.shape[1]
    if valid.ndim == 2:
        valid = valid[:, None, :]
    mask = valid
    if sliding_window is not None and k_pos is not None and q_pos is not None:
        in_win = k_pos > (q_pos[:, None, None] - sliding_window)
        mask = mask & in_win
    g = H // ch
    qg = q.reshape(b, ch, g, d)
    logits = jnp.einsum(
        "bcgd,bcsd->bcgs", qg, k_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * (d**-0.5)
    if k_scale is not None:
        logits = logits * k_scale[:, :, None, :]
    logits = jnp.where(mask[:, :, None, :], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        p = p * v_scale[:, :, None, :]
    out = jnp.einsum(
        "bcgs,bcsd->bcgd", p.astype(q.dtype), v_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, H, 1, d).astype(q.dtype)


def pool_scores(
    scores: jnp.ndarray, valid: jnp.ndarray, kernel_size: int, pooling: str
) -> jnp.ndarray:
    """1-D pooling over the key axis, matching torch F.{avg,max}_pool1d semantics
    with stride=1, padding=kernel_size//2 (reference: fastkv/utils.py:106-108).

    torch avg_pool1d uses count_include_pad=True (divide by kernel_size always) and
    zero padding; max_pool1d pads with -inf. `valid` masks bucket-padding columns so
    they behave exactly like torch's out-of-range padding.
    scores: [b, h, s] fp32; valid: [b, s] bool. Invalid outputs are NOT masked here.
    """
    v = valid[:, None, :]
    if pooling == "avgpool":
        x = jnp.where(v, scores, 0.0)
        s = jax.lax.reduce_window(
            x,
            0.0,
            jax.lax.add,
            window_dimensions=(1, 1, kernel_size),
            window_strides=(1, 1, 1),
            padding=((0, 0), (0, 0), (kernel_size // 2, kernel_size // 2)),
        )
        return s / kernel_size
    elif pooling == "maxpool":
        x = jnp.where(v, scores, -jnp.inf)
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, 1, kernel_size),
            window_strides=(1, 1, 1),
            padding=((0, 0), (0, 0), (kernel_size // 2, kernel_size // 2)),
        )
    else:
        raise ValueError(f"pooling {pooling!r} not supported")
