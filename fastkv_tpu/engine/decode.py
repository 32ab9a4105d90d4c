"""Decode: single-token step over the compressed cache + greedy generation loop.

The reference decodes through HF `GenerationMixin.generate` with a patched
`prepare_inputs_for_generation` (baselines/monkeypatch.py:249-330) because the
compressed cache is shorter than the prompt; decode positions continue from the
*original* prompt length (position_ids = attention_mask.cumsum(-1) - 1 over the
full-length mask, monkeypatch.py:283-289). Here that is explicit: decode token t
has position n_true + t, appended at the static cache slot prefill_capacity + t
(no dynamic append indices — see fastkv_tpu.cache.kv_cache).

Generation runs as `lax.scan` over steps with the cache as carry — one compiled
program for the whole decode phase; per-token latency benchmarks instead jit a
single step and loop in Python (mirroring the reference's per-step CUDA-event
timing, benchmark/e2e.py:172-180).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fastkv_tpu.cache.kv_cache import KVCache
from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine.prefill import PrefillShapes
from fastkv_tpu.models import llama
from fastkv_tpu.models.rope import compute_inv_freq
from fastkv_tpu.ops import attention as att


def _dus_batch(arr: jnp.ndarray, upd: jnp.ndarray, slots: jnp.ndarray) -> jnp.ndarray:
    """Per-example dynamic_update_slice along the slot axis.

    arr [b, ch, C, ...]; upd [b, ch, 1, ...]; slots [b] int32. Used by the
    continuous-batching scheduler where each slot sits at a different depth."""
    def one(a, u, s):
        start = (jnp.zeros((), jnp.int32), s) + (jnp.zeros((), jnp.int32),) * (a.ndim - 2)
        return jax.lax.dynamic_update_slice(a, u, start)

    return jax.vmap(one)(arr, upd, slots)


def decode_step(
    params: Dict[str, Any],
    cfg: ModelConfig,
    mcfg: MethodConfig,
    cache: KVCache,
    token: jnp.ndarray,  # [b] int32
    pos: jnp.ndarray,  # [b] int32 — original position of this token
    slot: jnp.ndarray,  # int32 scalar (uniform) or [b] (per-example) cache slot
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step. Returns (logits [b, V] fp32, updated cache).

    Layers are UNROLLED (static indexing into the stacked params) rather than
    scanned: a lax.scan emitting per-layer cache slices as stacked ys would
    force XLA to materialize a fresh copy of the whole multi-GB cache every
    token, while unrolled dynamic_update_slice on the carried cache arrays
    updates in place. Decode ops are tiny, so unrolled compile time is fine.
    """
    inv_freq = jnp.asarray(compute_inv_freq(cfg))
    b = token.shape[0]
    h = llama.embed(params, cfg, token[:, None])  # [b, 1, D]
    ch = cache.k.shape[2]
    g_rep = ch // cfg.num_kv_heads  # 1, or groups for per-query-head caches
    zero = jnp.zeros((), jnp.int32)

    k_all, v_all = cache.k, cache.v
    pos_all, valid_all = cache.pos, cache.valid
    ks_all, vs_all = cache.k_scale, cache.v_scale
    quantized = ks_all is not None  # int8 cache (EngineConfig.kv_int8)
    pos_blk = jnp.broadcast_to(pos[:, None, None], (b, ch, 1)).astype(jnp.int32)
    per_example = getattr(slot, "ndim", 0) == 1

    def write(arr_all, li, upd):
        if per_example:
            layer = _dus_batch(arr_all[li], upd, slot.astype(jnp.int32))
            return arr_all.at[li].set(layer)
        idx = (jnp.int32(li), zero, zero, slot) + (
            (zero,) if upd.ndim == 4 else ()
        )
        return jax.lax.dynamic_update_slice(arr_all, upd[None], idx)

    for l in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda x: x[l], params["layers"])
        hn = llama.rms_norm(h, lp["ln_attn"], cfg.rms_norm_eps)
        q, k_new, v_new = llama.qkv_proj(lp, cfg, hn)  # q [b,H,1,d]
        q, k_new = llama.rope_qk(q, k_new, pos[:, None], inv_freq)
        if g_rep > 1:  # reference repeats kv before caching (snapkv/h2o)
            k_new = jnp.repeat(k_new, g_rep, axis=1)
            v_new = jnp.repeat(v_new, g_rep, axis=1)
        if quantized:
            from fastkv_tpu.core import quant

            k_new, k_sc = quant.quantize_kv(k_new)
            v_new, v_sc = quant.quantize_kv(v_new)
            ks_all = write(ks_all, l, k_sc)
            vs_all = write(vs_all, l, v_sc)
        k_all = write(k_all, l, k_new.astype(k_all.dtype))
        v_all = write(v_all, l, v_new.astype(v_all.dtype))
        pos_all = write(pos_all, l, pos_blk)
        valid_all = write(valid_all, l, jnp.ones((b, ch, 1), bool))
        attn_valid = valid_all[l]
        if cfg.sliding_window is not None:
            # Sliding-window semantics at decode follow the reference's Mistral
            # cache slicing (baselines/fastkv/mistral_model.py:72-98): the cache
            # is capped at its last `sliding_window` ENTRIES by cache order, NOT
            # by original token position — a compressed cache shorter than the
            # window keeps far-past selected tokens fully visible. Entry rank is
            # a cumsum over the validity mask (kept slots form an ordered
            # prefix; decode slots append after).
            rank = jnp.cumsum(attn_valid.astype(jnp.int32), axis=-1)
            total = rank[..., -1:]
            attn_valid = attn_valid & (rank > total - cfg.sliding_window)
        if use_pallas and not quantized:  # Pallas decode kernel is bf16-only
            from fastkv_tpu.ops.experimental import decode_attn

            attn = decode_attn.decode_attention(
                q, k_all[l], v_all[l], attn_valid,
                q_pos=pos, k_pos=pos_all[l], sliding_window=None,
            )
        else:
            attn = att.decode_attention(
                q, k_all[l], v_all[l], attn_valid,
                q_pos=pos, k_pos=pos_all[l], sliding_window=None,
                k_scale=ks_all[l] if quantized else None,
                v_scale=vs_all[l] if quantized else None,
            )
        h = h + llama.attn_out_proj(lp, attn)
        h = h + llama.mlp(lp, llama.rms_norm(h, lp["ln_mlp"], cfg.rms_norm_eps))

    new_cache = KVCache(
        k=k_all, v=v_all, pos=pos_all, valid=valid_all,
        k_scale=ks_all, v_scale=vs_all,
    )
    logits = llama.unembed(params, cfg, h)[:, 0, :]
    return logits, new_cache


class GenResult(NamedTuple):
    tokens: jnp.ndarray  # [b, max_new] int32 (pad_id after EOS)
    num_generated: jnp.ndarray  # [b] int32


def greedy_generate(
    params: Dict[str, Any],
    cfg: ModelConfig,
    mcfg: MethodConfig,
    shapes: PrefillShapes,
    first_logits: jnp.ndarray,  # [b, V] from prefill
    cache: KVCache,
    n_true: jnp.ndarray,  # [b] original prompt lengths
    max_new_tokens: int,
    eos_ids: Optional[jnp.ndarray] = None,  # [E] int32 or None
    min_new_tokens: int = 1,
    use_pallas: bool = False,
) -> Tuple[GenResult, KVCache]:
    """Greedy decoding as a lax.scan over steps (cache as carry).

    Matches the reference protocol: greedy, max_new_tokens per task,
    min_length = context + 1 (i.e. at least one new token; eval/run_longbench.py:
    217-226). Tokens after EOS are pad (0) and excluded from num_generated.
    """
    b = first_logits.shape[0]
    vocab = first_logits.shape[-1]
    eos_onehot = (
        jnp.isin(jnp.arange(vocab), eos_ids) if eos_ids is not None else None
    )

    def sample(logits, step):
        """Greedy pick; EOS suppressed while step < min_new_tokens."""
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
        cache, tok, done = carry
        pos = n_true + step  # original-position continuation
        slot = shapes.prefill_capacity + step
        logits, cache = decode_step(
            params, cfg, mcfg, cache, tok, pos, slot, use_pallas=use_pallas
        )
        nxt = jnp.where(done, 0, sample(logits, step + 1))
        new_done = done | is_eos(nxt)
        return (cache, nxt, new_done), (nxt, done)

    steps = jnp.arange(max_new_tokens - 1, dtype=jnp.int32)
    (cache, _, _), (rest, done_before) = jax.lax.scan(
        body, (cache, tok0, done0), steps
    )
    toks = jnp.concatenate([tok0[:, None], rest.T], axis=1)  # [b, max_new]
    alive = jnp.concatenate([jnp.ones((b, 1), bool), ~done_before.T], axis=1)
    toks = jnp.where(alive, toks, 0)
    num = jnp.sum(alive, axis=1).astype(jnp.int32)
    return GenResult(tokens=toks, num_generated=num), cache
