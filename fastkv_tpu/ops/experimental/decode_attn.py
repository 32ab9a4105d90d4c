"""Pallas TPU decode-attention kernel over the compressed KV cache.

TPU-native replacement for the reference's single-token flash decode call
(reference: baselines/fastkv/llama_model.py:181-183 with q_len=1 on the decode
branch; benchmark/e2e.py:172-180 times exactly this loop). Correctness
reference: fastkv_tpu.ops.attention.decode_attention (XLA path).

STATUS: EXPERIMENTAL (correct, parity-tested, but measured slower than XLA —
shelved here so the default path is honestly XLA). Opt in via
EngineConfig.decode_use_pallas=True.

Measurements (v5e via axon tunnel):
  * End-to-end (bench.py, 128K ctx, llama-3.2-1b): fullkv 102 -> 20 tok/s,
    fastkv 224 -> 175 tok/s — a hard regression.
  * Kernel-level A/B (round 3; single decode-attention call, b=1 H=32 ch=8
    d=64 bf16, 10-iter means; the ~2.6 ms floor is tunnel dispatch):

      | C      | XLA     | Pallas blk=4096 | Pallas blk=8192 |
      |--------|---------|-----------------|-----------------|
      | 26624  | 2836 us | 2615 us         | 2889 us         |
      | 131072 | 2637 us | 4502 us         | 4287 us         |

    At 131072 the XLA call is dispatch-bound (~0.4 ms of real work inside a
    2.6 ms call) while the Pallas call adds ~1.7-1.9 ms of kernel time —
    ~4x slower in-kernel. Block-size tuning (4096 vs 8192) does not close it.

  * Batched serving shapes (round 3; 32-call scanned loop inside one jit —
    no dispatch floor — b/C as in bench.throughput's 16K ladder):

      | B, C        | XLA        | Pallas blk=512 | Pallas blk=2048 |
      |-------------|------------|----------------|-----------------|
      | 64, 2048    | 1129 us    | 2156 us        | 1538 us         |
      | 64, 16384   | 4325 us    | 11343 us       | 6962 us         |
      | 8, 16384    | 1142 us    | 2058 us        | 1575 us         |

    The "batched decode might favor a hand kernel" hypothesis is dead too:
    XLA wins 1.4-2.6x at every batched shape tried. (XLA itself is far from
    peak BW at these shapes — 238 GB/s at B=64 C=2048 — but the headroom is
    intrinsic small-row/softmax overhead, not something this grid recovers.)

Why XLA wins here: its fused decode attention already runs at the HBM
roofline at batch 1 (~700 GB/s effective at 128K end-to-end — the [b, H, C]
logits tensor it materializes is 64x smaller than K/V at GQA 4:1 and fuses
away), so there is no bandwidth left to win, and this kernel's
per-(kv-head, block) grid serialization loses pipelining that XLA gets for
free. A future win would need a different design (flattened batch*head
parallel grid + paged gather indirection), not tuning of this one.

Design notes (decode is HBM-bandwidth-bound, not FLOP-bound):
  * One grid step per (batch, cache-head, cache-block): K and V stream through
    VMEM exactly once; QK^T, masking, online softmax and P·V are fused.
  * GQA native: the g = H/KH query heads of one kv head are the rows of the
    block matmuls, so grouping costs nothing and K/V are read once per kv head
    (not per query head).
  * Validity masking by slot index against a per-example count would be wrong
    here: compressed caches are *scattered* layouts (kept prefix + decode
    tail), so the caller passes an explicit bool `valid` mask, exactly like
    the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    q_pos_ref,  # scalar prefetch: [b] int32 query positions (sliding window)
    # inputs
    q_ref,  # [1, 1, g, d]
    k_ref,  # [1, 1, bc, d]
    v_ref,  # [1, 1, bc, d]
    valid_ref,  # [1, 1, 1, bc] int32 (bool widened; singleton second-minor dim
    #   because Mosaic requires second-minor block dims divisible by 8 or equal
    #   to the array dim)
    kpos_ref,  # [1, 1, 1, bc] int32
    # outputs
    o_ref,  # [1, 1, g, d]
    # scratch
    m_scr,  # [g, 128] fp32
    l_scr,  # [g, 128] fp32
    acc_scr,  # [g, d] fp32
    *,
    scale: float,
    num_c_blocks: int,
    sliding_window: Optional[int],
):
    ib = pl.program_id(0)
    ic = pl.program_id(2)

    @pl.when(ic == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # [g, d]
    k = k_ref[0, 0]  # [bc, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [g, bc]
    ok = valid_ref[0, 0, 0] != 0  # [bc]
    if sliding_window is not None:
        qp = q_pos_ref[ib]
        ok = ok & (kpos_ref[0, 0, 0] > qp - sliding_window)
    mask = jnp.broadcast_to(ok[None, :], s.shape)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    p = jnp.where(mask, p, 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_scr[...] = jnp.broadcast_to(
        corr * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True), l_scr.shape
    )
    acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0, 0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ic == num_c_blocks - 1)
    def _finalize():
        l = l_scr[:, :1]
        inv = jnp.where(l == 0.0, 0.0, 1.0 / jnp.where(l == 0.0, 1.0, l))
        o_ref[0, 0] = (acc_scr[...] * inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sliding_window", "block_c"))
def decode_attention(
    q: jnp.ndarray,  # [b, H, 1, d]
    k_cache: jnp.ndarray,  # [b, CH, C, d]
    v_cache: jnp.ndarray,  # [b, CH, C, d]
    valid: jnp.ndarray,  # [b, C] or [b, CH, C] bool
    q_pos: Optional[jnp.ndarray] = None,  # [b] int32 (needed for sliding window)
    k_pos: Optional[jnp.ndarray] = None,  # [b, CH, C] int32 cache position ids
    sliding_window: Optional[int] = None,
    # 4096 measured best on v5e (8192 ties, 16384 OOMs the 16M scoped VMEM);
    # k+v double-buffered blocks at 4096 use ~4 MB
    block_c: int = 4096,
) -> jnp.ndarray:
    """Fused single-token decode attention. Same contract as the XLA
    fastkv_tpu.ops.attention.decode_attention."""
    b, H, one, d = q.shape
    assert one == 1
    ch = k_cache.shape[1]
    C = k_cache.shape[2]
    g = H // ch
    if valid.ndim == 2:
        valid = jnp.broadcast_to(valid[:, None, :], (b, ch, C))
    if sliding_window is not None:
        if q_pos is None or k_pos is None:
            raise ValueError("sliding_window needs q_pos and k_pos")
    else:
        q_pos = jnp.zeros((b,), jnp.int32)
    if k_pos is None:
        k_pos = jnp.zeros((b, ch, C), jnp.int32)

    block_c = min(block_c, C)
    if C % block_c != 0:
        # Padding K/V here would copy the ENTIRE cache every decode step (the
        # pad is a fresh allocation XLA cannot elide around the custom call) —
        # measured 2x decode slowdown at 16K. Prefer any exactly-dividing block;
        # engines align cache capacity (plan_shapes) so the fast path is taken.
        for cand in (4096, 2048, 1024, 512, 256, 128):
            if cand <= block_c and C % cand == 0:
                block_c = cand
                break
    c_pad = pl.cdiv(C, block_c) * block_c
    if c_pad != C:
        pad_kv = ((0, 0), (0, 0), (0, c_pad - C), (0, 0))
        pad_m = ((0, 0), (0, 0), (0, c_pad - C))
        k_cache = jnp.pad(k_cache, pad_kv)
        v_cache = jnp.pad(v_cache, pad_kv)
        valid = jnp.pad(valid, pad_m)  # padded slots invalid
        k_pos = jnp.pad(k_pos, pad_m)
    nc = c_pad // block_c
    qg = q.reshape(b, ch, g, d)

    def q_map(ib, ih, ic, qpos_ref):
        return (ib, ih, 0, 0)

    def kv_map(ib, ih, ic, qpos_ref):
        return (ib, ih, ic, 0)

    def mask_map(ib, ih, ic, qpos_ref):
        return (ib, ih, 0, ic)

    def o_map(ib, ih, ic, qpos_ref):
        return (ib, ih, 0, 0)

    kernel = functools.partial(
        _kernel,
        scale=d**-0.5,
        num_c_blocks=nc,
        sliding_window=sliding_window,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ch, nc),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), q_map),
            pl.BlockSpec((1, 1, block_c, d), kv_map),
            pl.BlockSpec((1, 1, block_c, d), kv_map),
            pl.BlockSpec((1, 1, 1, block_c), mask_map),
            pl.BlockSpec((1, 1, 1, block_c), mask_map),
        ],
        out_specs=[pl.BlockSpec((1, 1, g, d), o_map)],
        scratch_shapes=[
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, d), jnp.float32),
        ],
    )
    cost = pl.CostEstimate(
        flops=b * ch * g * 4 * C * d,
        bytes_accessed=(k_cache.size + v_cache.size) * k_cache.dtype.itemsize,
        transcendentals=b * ch * g * C,
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, ch, g, d), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(
        q_pos.astype(jnp.int32),
        qg,
        k_cache,
        v_cache,
        valid.astype(jnp.int32)[:, :, None, :],
        k_pos.astype(jnp.int32)[:, :, None, :],
    )
    return out.reshape(b, H, 1, d)
