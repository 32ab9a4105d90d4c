"""GemFilter: two-pass generation (engine-level strategy).

Reference semantics (baselines/gemfilter/utils.py:25-56,107-158 and
baselines/gemfilter/llama_model.py:90-189):
  pass 1: run only layers [0, filter_idx]; at the filter layer score every
          prompt token by (last-query . key), summed over all query heads
          (GQA keys repeated), avg-pooled (kernel 5); top-k tokens, sorted by
          position, are gathered FROM THE INPUT IDS;
  pass 2: re-run the full model on the reduced token sequence (fresh contiguous
          positions — it is a new, shorter prompt) and decode greedily from its
          full cache.

TPU re-architecture: pass 1 needs no KV cache and no attention output at the
filter layer (only q_last . K), so it runs as a cache-free layer scan plus one
QKV projection; pass 2 reuses the standard FullKV prefill at the reduced
(static) bucket. Selection uses the same static-capacity + traced-budget
scheme as the other policies.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from fastkv_tpu.core.config import EngineConfig, MethodConfig, ModelConfig, round_up
from fastkv_tpu.models import llama
from fastkv_tpu.models.rope import compute_inv_freq
from fastkv_tpu.ops import attention as att
from fastkv_tpu.policies import selection


def filter_capacity(mcfg: MethodConfig, bucket: int, align: int = 128) -> int:
    """Static extent of the reduced pass-2 prompt."""
    if mcfg.eviction_mode == "proportional":
        cap = int(bucket * mcfg.retain_rate)
    else:
        cap = mcfg.max_capacity_prompt
    return min(round_up(max(cap, align), align), bucket)


def select_tokens(
    params: Dict[str, Any],
    cfg: ModelConfig,
    mcfg: MethodConfig,
    ecfg: EngineConfig,
    tokens: jnp.ndarray,  # [b, bucket]
    n_true: jnp.ndarray,  # [b]
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pass 1. Returns (new_tokens [b, capacity], new_count [b], sel_idx)."""
    b, s = tokens.shape
    inv_freq = jnp.asarray(compute_inv_freq(cfg))
    h = llama.embed(params, cfg, tokens)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    valid = positions < n_true[:, None]

    def body(h, li):
        # dynamic-index the full stacked params (a pre-sliced scan xs becomes
        # a weight-sized HLO-temp copy — see prefill.scan_segment)
        lp = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, li, 0, keepdims=False),
            params["layers"],
        )
        hn = llama.rms_norm(h, lp["ln_attn"], cfg.rms_norm_eps)
        q, k, v = llama.qkv_proj(lp, cfg, hn)
        q, k = llama.rope_qk(q, k, positions, inv_freq)
        if ecfg.use_pallas:
            from fastkv_tpu.ops import flash_prefill

            attn = flash_prefill.flash_attention(
                q, k, v, positions, n_true, sliding_window=cfg.sliding_window
            )
        else:
            attn = att.chunked_causal_attention(
                q, k, v, positions, positions, valid, sliding_window=cfg.sliding_window
            )
        h = h + llama.attn_out_proj(lp, attn)
        h = h + llama.mlp(
            lp, llama.rms_norm(h, lp["ln_mlp"], cfg.rms_norm_eps),
            chunk=ecfg.mlp_chunk_for(h.shape[1]),
        )
        return h, None

    fi = mcfg.filter_idx
    h, _ = jax.lax.scan(body, h, jnp.arange(fi, dtype=jnp.int32))

    # filter layer: only q/k needed (reference find_context uses the layer's
    # q_last and keys; gemfilter/llama_model.py:142-151 skips cache writes in
    # select mode)
    lp = jax.tree_util.tree_map(lambda x: x[fi], params["layers"])
    hn = llama.rms_norm(h, lp["ln_attn"], cfg.rms_norm_eps)
    q, k, _ = llama.qkv_proj(lp, cfg, hn)
    q, k = llama.rope_qk(q, k, positions, inv_freq)

    last_idx = jnp.maximum(n_true - 1, 0)[:, None]  # [b, 1]
    q_last = jnp.take_along_axis(q, last_idx[:, None, :, None], axis=2)  # [b,H,1,d]
    g = cfg.num_kv_groups
    qg = q_last.reshape(b, cfg.num_kv_heads, g, cfg.head_dim)
    scores = jnp.einsum(
        "bkgd,bksd->bks", qg, k, preferred_element_type=jnp.float32
    ).sum(axis=1, keepdims=True)  # [b, 1, s] summed over all heads (utils.py:28-29)
    # avg-pool kernel 5 (standard_dis_index defaults, utils.py:31-32); invalid
    # columns behave like torch zero padding
    pooled = att.pool_scores(scores, valid, kernel_size=5, pooling="avgpool")

    if mcfg.eviction_mode == "proportional":
        k_budget = jnp.floor(n_true.astype(jnp.float32) * mcfg.retain_rate).astype(jnp.int32)
    else:
        k_budget = jnp.full_like(n_true, mcfg.max_capacity_prompt)
    k_budget = jnp.minimum(k_budget, n_true)  # min(topk, n), utils.py:51-52

    top_idx, top_valid = selection.topk_select(pooled, valid, k_budget, capacity)
    keep_mask = jnp.zeros((b, s), bool)
    keep_mask = keep_mask.at[
        jnp.arange(b)[:, None], top_idx[:, 0, :]
    ].max(top_valid[:, 0, :])
    sel_idx, sel_valid = selection.sorted_union_indices(keep_mask, capacity)
    new_tokens = jnp.take_along_axis(tokens, sel_idx, axis=1)
    new_tokens = jnp.where(sel_valid, new_tokens, 0)
    new_count = jnp.sum(sel_valid, axis=-1).astype(jnp.int32)
    return new_tokens, new_count, sel_idx
