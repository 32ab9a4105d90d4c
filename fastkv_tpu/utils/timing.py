"""Device timing utilities.

Replaces the reference's CUDA-event timing (reference: benchmark/e2e.py:162-180,
benchmark/prefill.py:103-111) with fetch-forced wall timing.

IMPORTANT backend quirk (axon-tunneled TPU): `jax.block_until_ready` returns
when dispatch is accepted, NOT when execution completes, and the first real
execution in a process pays a one-time multi-minute remote warmup. Correct
methodology here is therefore:
  1. call `warmup_device()` once at process start,
  2. time a program by fetching a scalar reduction of one of its outputs
     (PJRT executes the whole executable atomically, so one output forces all).
On standard backends this degrades gracefully to block_until_ready semantics
plus one tiny D2H copy.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp


def force(x: Any) -> float:
    """Force execution of the program that produced x; returns a scalar fetch."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    if leaf.dtype == jnp.bool_:
        leaf = leaf.astype(jnp.int32)
    return float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))


def warmup_device() -> float:
    """Absorb the one-time remote-execution warmup; returns seconds spent."""
    t0 = time.perf_counter()
    x = jnp.ones((128, 128), jnp.float32)
    force(jax.jit(lambda a: a @ a)(x))
    return time.perf_counter() - t0


