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
  * Fused observation-window score accumulation (SnapKV/FastKV TSP): the
    reference pays a second W x n QK^T pass with a full-row fp32 softmax to
    score keys (reference: baselines/fastkv/utils.py:94-104 and
    baselines/snapkv/utils.py:72-88) — a full re-read of K from HBM. Here the
    last-W-query-rows strip is scored *inside* the flash kernel: at each
    diagonal grid step (iq == ik) the resident K block also multiplies the
    window queries, and the raw masked logits land in a persistent
    [W, s_pad] fp32 VMEM scratch. The final grid step runs the exact softmax
    over the whole strip (true row max/sum — no online-rescale approximation)
    and emits per-query-head column scores. Keys stream through VMEM once for
    both attention and scoring.

Correctness references: fastkv_tpu.ops.attention.chunked_causal_attention and
fastkv_tpu.engine.prefill._window_scores (the unfused XLA scoring pass).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def fusion_vmem_ok(sk: int, window: int, block: int = 1024) -> bool:
    """True if fused window scoring fits scoped VMEM WITHOUT shrinking the
    attention blocks. The raw-logit strip ([wp, sk] fp32) lives in VMEM for
    the whole kernel; at 1024^2 blocks the remaining footprint is ~12.5 MB
    (measured: 16.54M scoped at sk=131072 > the 16M limit), so the strip must
    stay under ~3.4 MB. Beyond that the caller should use the separate XLA
    scoring pass instead: prefill is MXU-compute-bound, and halving the
    blocks to make VMEM room costs ~60% more attention time (measured at
    131072: 20.9s fused@512^2 vs 13.1s unfused@1024^2) while the fusion only
    saves an O(K) HBM re-read (~2% of prefill)."""
    wp = ((window + 7) // 8) * 8
    return sk * 4 * wp <= 3_400_000 or block <= 512


def _below_or_on_diag(iq: jnp.ndarray, bq: int, ik: jnp.ndarray, bk: int):
    """True if kv block ik overlaps the causal (lower-triangular) region of
    query block iq, i.e. first kv index <= last q index."""
    return ik * bk <= iq * bq + (bq - 1)


def _kernel(
    # scalar prefetch
    count_ref,  # [2, b] int32 — row 0: number of valid tokens per example;
    #   row 1: k_hi block gate (key blocks starting at or beyond it are
    #   skipped entirely — DMA redirected to block 0, no compute)
    # inputs
    q_ref,  # [1, 1, bq, d]
    k_ref,  # [1, 1, bk, d]
    v_ref,  # [1, 1, bk, d]
    pq_ref,  # [1, 1, bq] int32 query positions (singleton second-minor dim:
    #   Mosaic requires second-minor block dims divisible by 8 or equal to the
    #   array dim, so [b, s] with block (1, bq) is rejected when b > 1)
    pk_ref,  # [1, 1, bk] int32 key positions
    *rest,  # [qw_ref, qwpos_ref] when window_scores, then outputs, then scratch
    scale: float,
    block_q: int,
    block_k: int,
    num_q_blocks: int,
    num_k_blocks: int,
    sliding_window: Optional[int],
    causal_skip: bool,
    return_aux: bool,
    window_scores: int,  # 0 = off; else number of window rows (padded to 8)
):
    i = 0
    if window_scores:
        qw_ref, qwpos_ref = rest[i], rest[i + 1]  # [1,1,Wp,d], [1,Wp,128]
        i += 2
    o_ref = rest[i]  # [1, 1, bq, d]
    i += 1
    if return_aux:
        m_out, l_out = rest[i], rest[i + 1]
        i += 2
    if window_scores:
        scores_out = rest[i]  # [1, 1, 1, sk_pad]
        i += 1
    m_scr, l_scr, acc_scr = rest[i], rest[i + 1], rest[i + 2]
    i += 3
    if window_scores:
        strip_scr = rest[i]  # [Wp, sk_pad] fp32 raw logits (then probs)
        wm_scr = rest[i + 1]  # [Wp, 128] fp32 online row max
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
        else (ik * block_k < count_ref[1, ib])
    )

    @pl.when(run_gate)
    def _run():
        q = q_ref[0, 0]  # [bq, d]
        k = k_ref[0, 0]  # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]

        # NOTE: a lax.cond that skips mask construction on interior blocks was
        # tried and REGRESSED (Mosaic duplicates branch buffers: -25% perf and
        # VMEM OOM at 1024x1024 blocks); cheap unconditional masking wins.
        # Key VALIDITY is folded into pk by the wrapper (invalid/padded key
        # slots carry position 2^30, which the causal compare rejects), so the
        # mask is ONE broadcast compare instead of iota+compare+and. Together
        # with skipping the post-exp where (below) this measured -12% on
        # end-to-end prefill at 128-160K (ROOFLINE.md §6).
        pq = pq_ref[0, 0].astype(jnp.int32)  # [bq]
        pk = pk_ref[0, 0].astype(jnp.int32)  # [bk]
        mask = pk[None, :] <= pq[:, None]
        if sliding_window is not None:
            mask = mask & (pk[None, :] > pq[:, None] - sliding_window)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        if not (causal_skip and sliding_window is None):
            # exp garbage (=1.0) appears only on rows whose running max is
            # still NEG_INF — impossible for VALID rows in the pure-causal
            # layout, where every valid row sees at least itself; possible for
            # ring 'full' chunks (all keys may be after the query) and under a
            # sliding window (a row's visible window may start blocks later),
            # so those paths keep the correction.
            # INVARIANT (pure-causal path): an INVALID row CAN see zero keys —
            # e.g. a padded row (pq=0) in post-TSP segment B where the
            # smallest kept key position is > 0 — and then carries finite
            # garbage (~mean of V) where the XLA fallback writes 0. Every
            # caller must mask consumed rows by its validity mask; the engine
            # does (tsp_gather/_gather_cache/last-valid-token unembed all mask
            # by `valid`), asserted in tests/test_flash_kernel.py.
            p = jnp.where(mask, p, 0.0)

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

    if window_scores:
        # Diagonal steps see every K block exactly once (causal_skip implies a
        # shared block coordinate system, nq == nk): score the window strip
        # against the K block already resident in VMEM. Raw masked logits are
        # staged in strip_scr (+ an online row max); the softmax is deferred to
        # the last grid step so it uses the true row max/denominator (exact,
        # not online-rescaled).
        @pl.when((iq == 0) & (ik == 0))
        def _strip_init():
            wm_scr[...] = jnp.full_like(wm_scr, NEG_INF)

        @pl.when(iq == ik)
        def _strip():
            qw = qw_ref[0, 0]  # [Wp, d]
            kk = k_ref[0, 0]  # [bk, d]
            sw = jax.lax.dot_general(
                qw, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [Wp, bk]
            pw = qwpos_ref[0][:, :1]  # [Wp, 1]; -1 marks invalid window rows
            pk = pk_ref[0, 0].astype(jnp.int32)  # [bk]
            col_idx = ik * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (window_scores, block_k), 1
            )
            wmask = (pk[None, :] <= pw) & (col_idx < count_ref[0, ib]) & (pw >= 0)
            sw = jnp.where(wmask, sw, NEG_INF)
            strip_scr[:, pl.ds(ik * block_k, block_k)] = sw
            wm_scr[...] = jnp.maximum(
                wm_scr[...], jnp.max(sw, axis=1, keepdims=True)
            )

        @pl.when((iq == num_q_blocks - 1) & (ik == num_k_blocks - 1))
        def _strip_finalize():
            # Block-chunked two-pass softmax: full-strip elementwise temporaries
            # ([Wp, sk_pad] fp32) would blow the scoped-VMEM stack at 192K+
            # (measured 16.26M > 16M); per-block temporaries are [Wp, bk].
            m = wm_scr[:, :1]  # true row max (accumulated over all blocks)
            row_valid = m > NEG_INF / 2

            def pass1(j, l):
                blk = strip_scr[:, pl.ds(j * block_k, block_k)]
                p = jnp.where(row_valid, jnp.exp(blk - m), 0.0)
                strip_scr[:, pl.ds(j * block_k, block_k)] = p
                return l + jnp.sum(p, axis=1, keepdims=True)

            l = jax.lax.fori_loop(
                0, num_k_blocks, pass1,
                jnp.zeros((window_scores, 1), jnp.float32),
            )
            inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)

            def pass2(j, _):
                p = strip_scr[:, pl.ds(j * block_k, block_k)]
                scores_out[0, 0, :, pl.ds(j * block_k, block_k)] = jnp.sum(
                    p * inv, axis=0, keepdims=True
                )
                return _

            jax.lax.fori_loop(0, num_k_blocks, pass2, 0)

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
    # None = 2048x1024 default (measured fastest on v5e: d=64 s=131072 66.1
    # vs 63.1 TF/s for 1024^2; d=128 s=65536 120.6 vs 114.9 and s=131072
    # 131.4 vs 125.3 TF/s — +4.7-4.9%; 2048^2 and 4096x1024 VMEM-fail —
    # scripts/sweep_flash_blocks.py, ROOFLINE §6) EXCEPT at d>64 for every
    # variant that keeps the post-exp `where` correction (sliding window,
    # pattern='full' ring chunks, non-square k_hi calls): those stay at
    # 1024^2 — the correction + extra mask term push the 2048-q-block
    # scoped-VMEM stack to 23.38M > the 16M limit, reproduced on-chip for
    # BOTH the SWA (scripts/tpu_kernel_parity.py) and the 'full' d=128
    # variants; plain-causal d=128 compiles and wins at 2048. Fused window
    # scoring requires square blocks; the wrapper clamps to min(bq, bk).
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    pattern: str = "causal",  # 'causal' (local diagonal skip) | 'full' (no skip;
    #   used by ring attention for kv chunks that precede the query chunk —
    #   masking is still position-based either way)
    return_aux: bool = False,  # also return (m, l) row statistics for
    #   cross-chunk online-softmax merging (ring attention)
    k_positions: Optional[jnp.ndarray] = None,  # [b, sk] when k/v come from a
    #   different chunk than q (ring); defaults to `positions`
    k_count: Optional[jnp.ndarray] = None,  # [b] valid keys; defaults to count
    window_q: Optional[jnp.ndarray] = None,  # [b, H, W, d] observation-window
    #   query rows (post-RoPE); enables fused SnapKV/TSP scoring — the kernel
    #   additionally returns per-query-head key scores [b, H, sk] fp32 (the
    #   full-row softmax of the window strip, column-summed over window rows).
    window_q_pos: Optional[jnp.ndarray] = None,  # [b, W] int32 original
    #   positions of the window rows; -1 marks invalid (short-prompt) rows
    k_hi: Optional[jnp.ndarray] = None,  # [b] int32 DYNAMIC key-block gate for
    #   non-square (sk != s) calls: key blocks starting at or beyond k_hi are
    #   skipped (no DMA, no compute). Used by chunked prefill, where a c-token
    #   chunk attends a bucket-sized scratch of which only the first
    #   start+c slots can be causally visible — restores the triangular cost
    #   that the static causal block skip provides in the square case.
):
    b, h, s, d = q.shape
    kh = k.shape[1]
    sk = k.shape[2]
    g = h // kh
    causal_skip = pattern == "causal" and sk == s
    if block_q is None:
        # the pure-causal layout drops the post-exp correction; every other
        # variant keeps it and overflows scoped VMEM at d>64 with 2048 rows
        pure = causal_skip and sliding_window is None
        block_q = 2048 if (d <= 64 or pure) else 1024
    if block_k is None:
        block_k = 1024
    if k_positions is None:
        k_positions = positions
    if k_count is None:
        k_count = count
    block_q = min(block_q, s)
    block_k = min(block_k, sk)
    wp = 0
    if window_q is not None:
        # fused scoring relies on the shared diagonal coordinate system
        assert causal_skip, "window scoring requires causal prefill (sk == s)"
        w = window_q.shape[2]
        wp = ((w + 7) // 8) * 8  # fp32 sublane tile
        if wp != w:
            window_q = jnp.pad(window_q, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
            window_q_pos = jnp.pad(
                window_q_pos, ((0, 0), (0, wp - w)), constant_values=-1
            )
        # VMEM budget: the raw-logit strip ([wp, s_pad] fp32, 32*sk bytes at
        # W=8) + the full-row scores output must coexist with the per-block
        # buffers (~12.5 MB at 1024^2 blocks: measured 16.54M scoped at
        # sk=131072, 17.54M at 192K — both over the 16M scoped-VMEM limit).
        # Halving the blocks frees ~6 MB and keeps the kernel compiling out
        # to 256K+; the switch point must be where strip+buffers first
        # exceeds 16M, i.e. sk ~ 106K, NOT 128K (round 2 shipped the clamp
        # at >131072 and the fused kernel VMEM-OOMed at exactly 131072).
        if sk * 4 * wp > 3_400_000:
            block_q = min(block_q, 512)
            block_k = min(block_k, 512)
        # the strip is scored exactly once per key block at the iq == ik
        # diagonal, which requires a square block grid — clamp the (possibly
        # rectangular) defaults down to square
        block_q = block_k = min(block_q, block_k)
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
    # fold key VALIDITY into the key positions: slots at or beyond k_count
    # (invalid tail + block padding) get position 2^30, which the kernel's
    # causal compare (pk <= pq) rejects — the mask needs no per-block iota
    # against count (-12% end-to-end prefill at 128-160K, ROOFLINE.md §6)
    k_positions = jnp.where(
        jnp.arange(sk_pad, dtype=jnp.int32)[None, :] < k_count[:, None],
        k_positions.astype(jnp.int32),
        jnp.int32(1 << 30),
    )
    nq = s_pad // block_q
    nk = sk_pad // block_k
    grid = (b, h, nq, nk)

    def _live(ib, iq, ik, count_ref):
        """Does grid step (iq, ik) do real work? (static skip or dynamic k_hi)"""
        if causal_skip:
            return _below_or_on_diag(iq, block_q, ik, block_k)
        return ik * block_k < count_ref[1, ib]

    def q_map(ib, ih, iq, ik, count_ref):
        return (ib, ih, iq, 0)

    def kv_map(ib, ih, iq, ik, count_ref):
        # skipped blocks revisit block 0: no DMA traffic
        ik = jax.lax.select(_live(ib, iq, ik, count_ref), ik, 0)
        return (ib, ih // g, ik, 0)

    def pq_map(ib, ih, iq, ik, count_ref):
        return (ib, 0, iq)

    def pk_map(ib, ih, iq, ik, count_ref):
        ik = jax.lax.select(_live(ib, iq, ik, count_ref), ik, 0)
        return (ib, 0, ik)

    def o_map(ib, ih, iq, ik, count_ref):
        return (ib, ih, iq, 0)

    kernel = functools.partial(
        _kernel,
        scale=d**-0.5,
        block_q=block_q,
        block_k=block_k,
        num_q_blocks=nq,
        num_k_blocks=nk,
        sliding_window=sliding_window,
        causal_skip=causal_skip,
        return_aux=return_aux,
        window_scores=wp,
    )
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_map),
        pl.BlockSpec((1, 1, block_k, d), kv_map),
        pl.BlockSpec((1, 1, block_k, d), kv_map),
        pl.BlockSpec((1, 1, block_q), pq_map),
        pl.BlockSpec((1, 1, block_k), pk_map),
    ]
    inputs = [
        q, k, v,
        positions.astype(jnp.int32)[:, None, :],
        k_positions.astype(jnp.int32)[:, None, :],
    ]
    if wp:
        in_specs.append(
            pl.BlockSpec((1, 1, wp, d), lambda ib, ih, iq, ik, c: (ib, ih, 0, 0))
        )
        inputs.append(window_q)
        # positions broadcast across the 128-lane dim so the kernel can read a
        # [Wp, 1] column without lane-dim slicing
        in_specs.append(
            pl.BlockSpec((1, wp, 128), lambda ib, ih, iq, ik, c: (ib, 0, 0))
        )
        inputs.append(
            jnp.broadcast_to(
                window_q_pos.astype(jnp.int32)[:, :, None], (b, wp, 128)
            )
        )
    out_shapes = [jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d), o_map)]
    if return_aux:
        # row statistics for cross-chunk merging; lane dim is the min 128-wide
        # tile (only column 0 is meaningful — sliced by the caller)
        for _ in range(2):
            out_shapes.append(jax.ShapeDtypeStruct((b, h, s_pad, 128), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, block_q, 128), o_map))
    scratch_shapes = [
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    if wp:
        out_shapes.append(jax.ShapeDtypeStruct((b, h, 1, sk_pad), jnp.float32))
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 1, sk_pad), lambda ib, ih, iq, ik, c: (ib, ih, 0, 0)
            )
        )
        scratch_shapes.append(pltpu.VMEM((wp, sk_pad), jnp.float32))
        scratch_shapes.append(pltpu.VMEM((wp, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    denom = 2 if causal_skip else 1
    cost = pl.CostEstimate(
        flops=b * h * 4 * s * sk * d // denom,
        bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
        transcendentals=b * h * s * sk // denom,
    )
    # the score strip accumulates across q rows -> iq must stay sequential
    iq_sem = "arbitrary" if wp else "parallel"
    khi_arr = (
        jnp.full((b,), sk_pad, jnp.int32) if k_hi is None
        else jnp.minimum(k_hi.astype(jnp.int32), sk_pad)
    )
    # prefetch rows: [0] key-side count (column masking), [1] k_hi block gate
    scal = jnp.stack([k_count.astype(jnp.int32), khi_arr])
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", iq_sem, "arbitrary"),
        ),
        cost_estimate=cost,
    )(scal, *inputs)
    out = outs[0][:, :, :s, :]
    ret = [out]
    if return_aux:
        ret.append(outs[1][:, :, :s, 0])
        ret.append(outs[2][:, :, :s, 0])
    if wp:
        ret.append(outs[-1][:, :, 0, :sk])
    return ret[0] if len(ret) == 1 else tuple(ret)
