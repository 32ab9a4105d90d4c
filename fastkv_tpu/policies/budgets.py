"""Budget derivation — pure functions, host-side static capacities plus traced
per-example budget scalars.

Mirrors the two knob regimes of the reference:
  * eviction_mode="constant": absolute budgets `max_capacity_prompt` / `tsp_len`
  * eviction_mode="proportional": `retain_rate` / `tsp_rate` fractions of the true
    prompt length (reference: baselines/fastkv/utils.py:86-87,123-124 and the
    per-layer retain split in compress_fastkv, baselines/fastkv/utils.py:43-46:
    layers <= tsp_idx use retain_rate, layers > tsp_idx use retain_rate/tsp_rate —
    so every layer ends up holding ~retain_rate * n entries).

Static-shape scheme: the *capacity* (array extent) is derived from the padded
bucket length and rounded up for lane alignment; the *used budget* is a traced
per-example int32. Selected slots at ranks >= budget are masked invalid, which
reproduces exact per-example reference budgets under padding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from fastkv_tpu.core.config import MethodConfig, round_up


@dataclasses.dataclass(frozen=True)
class PrefillBudget:
    """Static capacities for one prefill segment."""

    # cache key/value capacity for the policy-selected (non-window) part
    keep_capacity: int
    # TSP propagation capacity (only for the fastkv TSP hand-off); includes window
    tsp_capacity: Optional[int]
    window_size: int


def static_prefill_budget(
    mcfg: MethodConfig,
    seg_len_bucket: int,
    is_post_tsp: bool,
    align: int = 128,
) -> PrefillBudget:
    """Capacity (static) for a prefill segment whose padded length is seg_len_bucket."""
    w = mcfg.window_size
    if mcfg.eviction_mode == "proportional":
        rate = mcfg.retain_rate if not is_post_tsp else mcfg.retain_rate / mcfg.tsp_rate
        cap = int(seg_len_bucket * rate)
    else:
        cap = mcfg.max_capacity_prompt
    cap = min(cap, seg_len_bucket)
    keep_capacity = round_up(max(cap - w, 1), align)
    keep_capacity = min(keep_capacity, seg_len_bucket)
    tsp_capacity = None
    if not is_post_tsp:
        if mcfg.eviction_mode == "proportional":
            tcap = int(seg_len_bucket * mcfg.tsp_rate)
        else:
            tcap = mcfg.tsp_len
        tcap = min(tcap, seg_len_bucket)
        tsp_capacity = min(round_up(max(tcap, w + 1), align), seg_len_bucket)
    return PrefillBudget(keep_capacity=keep_capacity, tsp_capacity=tsp_capacity, window_size=w)


def dynamic_keep_budget(
    mcfg: MethodConfig, n_true: jnp.ndarray, is_post_tsp: bool
) -> jnp.ndarray:
    """Traced per-example keep budget k (number of non-window tokens kept).

    n_true is the true (unpadded) length of the current segment's sequence.
    Follows: cap = int(n * retain) [proportional] else max_capacity_prompt; if
    n < cap the whole sequence is kept (reference's early-return branch,
    fastkv/utils.py:89-91); else k = cap - window.
    """
    w = mcfg.window_size
    if mcfg.eviction_mode == "proportional":
        rate = mcfg.retain_rate if not is_post_tsp else mcfg.retain_rate / mcfg.tsp_rate
        cap = jnp.floor(n_true.astype(jnp.float32) * rate).astype(jnp.int32)
    else:
        cap = jnp.full_like(n_true, mcfg.max_capacity_prompt)
    cap = jnp.minimum(cap, n_true)
    return jnp.maximum(cap - w, 0)


def dynamic_tsp_budget(mcfg: MethodConfig, n_true: jnp.ndarray) -> jnp.ndarray:
    """Traced TSP keep budget (non-window part), matching
    fastkv/utils.py:123-130: tsp_len = int(n * tsp_rate) [proportional];
    no reduction when n <= tsp_len (keep everything)."""
    w = mcfg.window_size
    if mcfg.eviction_mode == "proportional":
        tsp_len = jnp.floor(n_true.astype(jnp.float32) * mcfg.tsp_rate).astype(jnp.int32)
    else:
        tsp_len = jnp.full_like(n_true, mcfg.tsp_len)
    tsp_len = jnp.minimum(tsp_len, n_true)
    return jnp.maximum(tsp_len - w, 0)
