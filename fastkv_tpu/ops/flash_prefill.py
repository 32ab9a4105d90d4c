"""Pallas TPU flash-attention prefill kernel.

TPU-native replacement for the reference's external FlashAttention-2 CUDA
kernels (reference: baselines/fastkv/llama_model.py:8,79-81,181-183).

Engine-specific semantics:
  * GQA native: K/V stay in kv-head layout; the grid runs over query heads and
    the K/V BlockSpec index maps fold h -> h // group (no repeat_kv
    materialization, unlike the reference which repeats to full heads before
    its flash call in several baselines).
  * Causality over *original position ids*: token-selected (post-TSP) sequences
    carry non-contiguous positions (reference: fastkv/llama_model.py:252-259),
    so the mask is pos_k <= pos_q, not index comparison. Valid tokens always
    occupy a prefix of the layout, so column validity is idx < count.
  * Online softmax with unnormalized fp32 accumulator; block-level causal
    skipping redirects the K/V index map to block 0 on skipped blocks so the
    upper triangle costs neither FLOPs nor DMA bandwidth.

Correctness reference: fastkv_tpu.ops.attention.chunked_causal_attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _below_or_on_diag(iq: jnp.ndarray, bq: int, ik: jnp.ndarray, bk: int):
    """True if kv block ik overlaps the causal (lower-triangular) region of
    query block iq, i.e. first kv index <= last q index."""
    return ik * bk <= iq * bq + (bq - 1)


def _kernel(
    # scalar prefetch
    count_ref,  # [b] int32 — number of valid tokens per example
    # inputs
    q_ref,  # [1, 1, bq, d]
    k_ref,  # [1, 1, bk, d]
    v_ref,  # [1, 1, bk, d]
    pq_ref,  # [1, 1, bq] int32 query positions (singleton second-minor dim:
    #   Mosaic requires second-minor block dims divisible by 8 or equal to the
    #   array dim, so [b, s] with block (1, bq) is rejected when b > 1)
    pk_ref,  # [1, 1, bk] int32 key positions
    # outputs
    o_ref,  # [1, 1, bq, d]
    *rest,  # optional (m_out, l_out) refs when return_aux, then scratch
    scale: float,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
    sliding_window: Optional[int],
    causal_skip: bool,
    return_aux: bool,
):
    if return_aux:
        m_out, l_out = rest[0], rest[1]
        m_scr, l_scr, acc_scr = rest[2], rest[3], rest[4]
    else:
        m_scr, l_scr, acc_scr = rest[0], rest[1], rest[2]
    ib = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    run_gate = (
        _below_or_on_diag(iq, block_q, ik, block_k)
        if causal_skip
        else (ik >= 0)
    )

    @pl.when(run_gate)
    def _run():
        q = q_ref[0, 0]  # [bq, d]
        k = k_ref[0, 0]  # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]

        count = count_ref[ib]
        # NOTE: a lax.cond that skips mask construction on interior blocks was
        # tried and REGRESSED (Mosaic duplicates branch buffers: -25% perf and
        # VMEM OOM at 1024x1024 blocks); unconditional masking wins.
        pq = pq_ref[0, 0].astype(jnp.int32)  # [bq]
        pk = pk_ref[0, 0].astype(jnp.int32)  # [bk]
        col_idx = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = (pk[None, :] <= pq[:, None]) & (col_idx < count)
        if sliding_window is not None:
            mask = mask & (pk[None, :] > pq[:, None] - sliding_window)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)  # kill exp garbage on fully-masked rows

        corr = jnp.exp(m_prev - m_new)  # [bq, 1]
        l_new = corr * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        l = l_scr[:, :1]
        inv = jnp.where(l == 0.0, 0.0, 1.0 / jnp.where(l == 0.0, 1.0, l))
        o_ref[0, 0] = (acc_scr[...] * inv).astype(o_ref.dtype)
        if return_aux:
            m_out[0, 0] = m_scr[...]
            l_out[0, 0] = l_scr[...]


@functools.partial(
    jax.jit,
    static_argnames=("sliding_window", "block_q", "block_k", "pattern", "return_aux"),
)
def flash_attention(
    q: jnp.ndarray,  # [b, H, s, d]
    k: jnp.ndarray,  # [b, KH, sk, d]
    v: jnp.ndarray,  # [b, KH, sk, d]
    positions: jnp.ndarray,  # [b, s] int32 original positions (ascending prefix)
    count: jnp.ndarray,  # [b] int32 number of valid tokens
    sliding_window: Optional[int] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    pattern: str = "causal",  # 'causal' (local diagonal skip) | 'full' (no skip;
    #   used by ring attention for kv chunks that precede the query chunk —
    #   masking is still position-based either way)
    return_aux: bool = False,  # also return (m, l) row statistics for
    #   cross-chunk online-softmax merging (ring attention)
    k_positions: Optional[jnp.ndarray] = None,  # [b, sk] when k/v come from a
    #   different chunk than q (ring); defaults to `positions`
    k_count: Optional[jnp.ndarray] = None,  # [b] valid keys; defaults to count
):
    b, h, s, d = q.shape
    kh = k.shape[1]
    sk = k.shape[2]
    g = h // kh
    if k_positions is None:
        k_positions = positions
    if k_count is None:
        k_count = count
    causal_skip = pattern == "causal" and sk == s
    block_q = min(block_q, s)
    block_k = min(block_k, sk)
    # Mosaic's implicit edge-block padding corrupts partial blocks on real TPU
    # (observed: NaN in the valid rows of a trailing partial q block), so pad
    # sequences to block multiples explicitly; zero-padded keys are masked via
    # col_idx < count and padded query rows are sliced away below.
    s_pad = pl.cdiv(s, block_q) * block_q
    sk_pad = pl.cdiv(sk, block_k) * block_k
    if causal_skip:
        # diagonal skipping assumes one shared coordinate system
        blk = max(block_q, block_k)
        s_pad = sk_pad = pl.cdiv(s, blk) * blk
    if s_pad != s:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        positions = jnp.pad(positions, ((0, 0), (0, s_pad - s)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        k_positions = jnp.pad(k_positions, ((0, 0), (0, sk_pad - sk)))
    nq = s_pad // block_q
    nk = sk_pad // block_k
    grid = (b, h, nq, nk)

    def _skip(iq, ik):
        if not causal_skip:
            return None
        return _below_or_on_diag(iq, block_q, ik, block_k)

    def q_map(ib, ih, iq, ik, count_ref):
        return (ib, ih, iq, 0)

    def kv_map(ib, ih, iq, ik, count_ref):
        if causal_skip:
            # skipped (above-diagonal) blocks revisit block 0: no DMA traffic
            ik = jax.lax.select(_below_or_on_diag(iq, block_q, ik, block_k), ik, 0)
        return (ib, ih // g, ik, 0)

    def pq_map(ib, ih, iq, ik, count_ref):
        return (ib, 0, iq)

    def pk_map(ib, ih, iq, ik, count_ref):
        if causal_skip:
            ik = jax.lax.select(_below_or_on_diag(iq, block_q, ik, block_k), ik, 0)
        return (ib, 0, ik)

    def o_map(ib, ih, iq, ik, count_ref):
        return (ib, ih, iq, 0)

    kernel = functools.partial(
        _kernel,
        scale=d**-0.5,
        block_q=block_q,
        block_k=block_k,
        num_k_blocks=nk,
        sliding_window=sliding_window,
        causal_skip=causal_skip,
        return_aux=return_aux,
    )
    out_shapes = [jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d), o_map)]
    if return_aux:
        # row statistics for cross-chunk merging; lane dim is the min 128-wide
        # tile (only column 0 is meaningful — sliced by the caller)
        for _ in range(2):
            out_shapes.append(jax.ShapeDtypeStruct((b, h, s_pad, 128), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, block_q, 128), o_map))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_map),
            pl.BlockSpec((1, 1, block_k, d), kv_map),
            pl.BlockSpec((1, 1, block_k, d), kv_map),
            pl.BlockSpec((1, 1, block_q), pq_map),
            pl.BlockSpec((1, 1, block_k), pk_map),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    denom = 2 if causal_skip else 1
    cost = pl.CostEstimate(
        flops=b * h * 4 * s * sk * d // denom,
        bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
        transcendentals=b * h * s * sk // denom,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(
        k_count.astype(jnp.int32),  # kernel masks COLUMNS: key-side count
        q, k, v,
        positions.astype(jnp.int32)[:, None, :],
        k_positions.astype(jnp.int32)[:, None, :],
    )
    out = outs[0][:, :, :s, :]
    if return_aux:
        m = outs[1][:, :, :s, 0]
        l = outs[2][:, :, :s, 0]
        return out, m, l
    return out
