"""Pallas flash-prefill kernel vs the chunked-XLA reference implementation.

Runs in interpreter mode on CPU (SURVEY.md §4: unit-test each Pallas kernel
against a jnp reference on CPU); the TPU-compiled path is exercised by
bench.py / scripts on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from fastkv_tpu.ops import attention as att
from fastkv_tpu.ops.flash_prefill import flash_attention


def run_case(b, h, kh, s, d, count_vals, positions=None, sliding_window=None,
             block=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kh, s, d)), jnp.float32)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    count = jnp.asarray(count_vals, jnp.int32)
    valid = jnp.arange(s)[None, :] < count[:, None]

    ref = att.chunked_causal_attention(
        q, k, v, positions, positions, valid, sliding_window=sliding_window,
        q_block=64,
    )
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(
            q, k, v, positions, count, sliding_window=sliding_window,
            block_q=block, block_k=block,
        )
    return np.asarray(out), np.asarray(ref), valid


@pytest.mark.parametrize("s,count", [(256, [256]), (256, [200]), (384, [130])])
def test_flash_matches_reference(s, count):
    out, ref, valid = run_case(1, 4, 2, s, 64, count)
    v = np.asarray(valid)[0]
    np.testing.assert_allclose(out[0][:, v], ref[0][:, v], atol=2e-5, rtol=2e-5)


def test_flash_nonmonotonic_tail_positions():
    """Post-TSP layout: ascending valid prefix, zero-position invalid tail."""
    s, n = 256, 180
    pos = np.zeros((1, s), np.int32)
    pos[0, :n] = np.sort(np.random.default_rng(3).choice(1000, n, replace=False))
    out, ref, valid = run_case(1, 4, 2, s, 64, [n], positions=jnp.asarray(pos))
    v = np.asarray(valid)[0]
    np.testing.assert_allclose(out[0][:, v], ref[0][:, v], atol=2e-5, rtol=2e-5)


def test_flash_sliding_window():
    out, ref, valid = run_case(1, 4, 4, 256, 64, [256], sliding_window=64)
    np.testing.assert_allclose(out[0], ref[0], atol=2e-5, rtol=2e-5)


def test_flash_gqa_batch():
    out, ref, valid = run_case(2, 8, 2, 256, 32, [256, 140])
    for i in range(2):
        vi = np.asarray(valid)[i]
        np.testing.assert_allclose(out[i][:, vi], ref[i][:, vi], atol=2e-5, rtol=2e-5)
