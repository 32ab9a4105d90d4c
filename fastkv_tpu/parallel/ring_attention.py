"""Sequence parallelism: ring attention and Ulysses over the mesh 'seq' axis.

The reference has NO sequence parallelism (it scales long context purely
algorithmically — flash attention + KV eviction — and hard-caps prompts at
127,500 tokens; SURVEY.md §2.4/§5). This subsystem is new TPU scope
(BASELINE.json north_star): prefill beyond per-chip HBM shards the sequence
axis across ICI.

Ring attention: each shard holds a contiguous [s/P]-token chunk of Q/K/V.
P steps; at step t a shard computes partial flash attention of its local Q
against the K/V chunk originating at shard (i - t) mod P, merging partials via
online-softmax statistics (the flash kernel's return_aux=(m, l)); K/V chunks
rotate with lax.ppermute. Cross-chunk causality: a chunk strictly before the
local chunk is fully visible ('full' kernel pattern); a chunk strictly after
contributes nothing and is skipped with lax.cond; step 0 is the local causal
chunk.

Ulysses: lax.all_to_all reshards seq->heads before attention (every shard gets
all tokens of H/P heads), runs the plain causal kernel, and reshards back.
Cheap on ICI; best when H % P == 0 and s/P is large.

TSP under SP (SURVEY.md §5 'Long-context'): observation-window scores are
computed per shard on local keys and concatenated via all_gather before the
global top-k — selection is bit-identical to single-chip (see
fastkv_tpu.engine docs; wiring in a later round).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map


def _merge(o1, m1, l1, o2, m2, l2):
    """Merge two online-softmax partials (unscaled outputs o_i are already
    normalized by their own l_i; recombine exactly)."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m) * l1
    a2 = jnp.exp(m2 - m) * l2
    denom = a1 + a2
    safe = jnp.maximum(denom, 1e-30)
    w1 = (a1 / safe)[..., None]
    w2 = (a2 / safe)[..., None]
    o = o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2
    return o, m, denom


def ring_flash_attention(
    q: jnp.ndarray,  # [b, H, s_local, d] (already sharded chunk)
    k: jnp.ndarray,  # [b, KH, s_local, d]
    v: jnp.ndarray,
    positions: jnp.ndarray,  # [b, s_local] original positions of local tokens
    count_global: jnp.ndarray,  # [b] total valid tokens across shards
    axis_name: str = "seq",
    sliding_window: Optional[int] = None,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Runs INSIDE shard_map over `axis_name`. Returns [b, H, s_local, d]."""
    from fastkv_tpu.ops import attention as att
    from fastkv_tpu.ops.flash_prefill import flash_attention

    p = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    b, h, s_loc, d = q.shape

    def local_count(chunk_owner):
        start = chunk_owner * s_loc
        return jnp.clip(count_global - start, 0, s_loc)

    def partial_attn(kc, vc, pc, owner, pattern):
        if use_pallas:
            return flash_attention(
                q, kc, vc, positions, count_global,
                sliding_window=sliding_window, pattern=pattern, return_aux=True,
                k_positions=pc, k_count=local_count(owner),
            )
        # XLA fallback: masked attention with explicit stats
        kv_valid = (jnp.arange(s_loc)[None, :] < local_count(owner)[:, None])
        mask = (pc[:, None, :] <= positions[:, :, None]) & kv_valid[:, None, :]
        if sliding_window is not None:
            mask = mask & (pc[:, None, :] > positions[:, :, None] - sliding_window)
        logits = att._grouped_qk(q, kc) * (d ** -0.5)
        logits = jnp.where(mask[:, None, :, :], logits, att.NEG_INF)
        m = jnp.max(logits, axis=-1)
        e = jnp.exp(logits - m[..., None])
        e = jnp.where(mask[:, None, :, :], e, 0.0)
        l = jnp.sum(e, axis=-1)
        pr = e / jnp.maximum(l, 1e-30)[..., None]
        o = att._grouped_pv(pr, vc, q.dtype)
        return o, m, l

    # step 0: local causal chunk
    o, m, l = partial_attn(k, v, positions, i, "causal")

    kc, vc, pc = k, v, positions

    def body(carry, t):
        o, m, l, kc, vc, pc = carry
        perm = [(j, (j + 1) % p) for j in range(p)]
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        pc = jax.lax.ppermute(pc, axis_name, perm)
        owner = (i - t) % p  # origin shard of the chunk we now hold

        def compute(_):
            o2, m2, l2 = partial_attn(kc, vc, pc, owner, "full")
            return _merge(o, m, l, o2, m2, l2)

        def skip(_):
            return o, m, l

        # chunks strictly after the local chunk contribute nothing (causal)
        o, m, l = jax.lax.cond(owner < i, compute, skip, None)
        return (o, m, l, kc, vc, pc), None

    if p > 1:
        (o, m, l, _, _, _), _ = jax.lax.scan(
            body, (o.astype(jnp.float32), m, l, kc, vc, pc),
            jnp.arange(1, p), length=p - 1,
        )
    return o.astype(q.dtype)


def make_ring_attention(
    mesh: Mesh,
    axis_name: str = "seq",
    sliding_window: Optional[int] = None,
    use_pallas: bool = True,
):
    """shard_map-wrapped ring attention over `mesh`.

    Inputs are globally-shaped; q/k/v shard on the sequence axis, heads
    replicated across 'seq' (compose with TP by also sharding the head axis on
    'model' outside this wrapper)."""
    fn = functools.partial(
        ring_flash_attention,
        axis_name=axis_name,
        sliding_window=sliding_window,
        use_pallas=use_pallas,
    )
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(None, "model", axis_name, None),
            P(None, "model", axis_name, None),
            P(None, "model", axis_name, None),
            P(None, axis_name),
            P(None),
        ),
        out_specs=P(None, "model", axis_name, None),
        check_vma=False,
    )


def ulysses_attention(
    q: jnp.ndarray,  # [b, H, s_local, d] seq-sharded
    k: jnp.ndarray,
    v: jnp.ndarray,
    positions_global: jnp.ndarray,  # [b, s_global] (replicated)
    count_global: jnp.ndarray,  # [b]
    axis_name: str = "seq",
    sliding_window: Optional[int] = None,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Ulysses SP (inside shard_map): all_to_all seq->heads, causal attention
    over the full sequence on H/P local heads, all_to_all back."""
    from fastkv_tpu.ops import attention as att
    from fastkv_tpu.ops.flash_prefill import flash_attention

    p = jax.lax.axis_size(axis_name)
    b, h, s_loc, d = q.shape
    kh = k.shape[1]
    # GQA: kv heads must split across the axis; minimally replicate them
    # (standard Ulysses-GQA). Query-to-kv grouping stays consistent because
    # repeat_interleave keeps h -> (h // (H/(kh*r))) // r == h // (H/kh).
    r = 1
    while (kh * r) % p:
        r += 1
    if r > 1:
        if (h % (kh * r)) != 0:
            raise ValueError(
                f"ulysses: cannot replicate {kh} kv heads onto axis size {p} "
                f"with {h} query heads"
            )
        k = jnp.repeat(k, r, axis=1)
        v = jnp.repeat(v, r, axis=1)

    def to_seq_full(x):
        # [b, heads, s/P, d] -> [b, heads/P, s, d]
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    def to_seq_shard(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    qf, kf, vf = to_seq_full(q), to_seq_full(k), to_seq_full(v)
    if use_pallas:
        of = flash_attention(
            qf, kf, vf, positions_global, count_global, sliding_window=sliding_window
        )
    else:
        valid = jnp.arange(qf.shape[2])[None, :] < count_global[:, None]
        of = att.chunked_causal_attention(
            qf, kf, vf, positions_global, positions_global, valid,
            sliding_window=sliding_window,
        )
    return to_seq_shard(of)


def make_ulysses_attention(
    mesh: Mesh,
    axis_name: str = "seq",
    sliding_window: Optional[int] = None,
    use_pallas: bool = True,
):
    fn = functools.partial(
        ulysses_attention,
        axis_name=axis_name,
        sliding_window=sliding_window,
        use_pallas=use_pallas,
    )
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(None, "model", axis_name, None),
            P(None, "model", axis_name, None),
            P(None, "model", axis_name, None),
            P(None, None),
            P(None),
        ),
        out_specs=P(None, "model", axis_name, None),
        check_vma=False,
    )
