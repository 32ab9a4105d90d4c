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


def test_engine_fused_scores_matches_xla_path():
    """Full fastkv prefill with the fused Pallas scoring (use_pallas=True,
    interpret mode) must reproduce the XLA path's logits and compressed cache
    — same TSP keep-set, same per-layer selections."""
    from fastkv_tpu.core.config import (
        EngineConfig, Method, MethodConfig, ModelConfig,
    )
    from fastkv_tpu.engine import prefill as prefill_mod
    from fastkv_tpu.models.llama import init_params

    cfg = ModelConfig.tiny(num_kv_heads=2, num_heads=4, hidden_size=64,
                           intermediate_size=128)
    mcfg = MethodConfig(
        method=Method.FASTKV, eviction_mode="proportional",
        retain_rate=0.25, tsp_rate=0.5, tsp_idx=1, window_size=8,
    )
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(11)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 256)), jnp.int32)
    n_true = jnp.array([256, 170], jnp.int32)

    def run(use_pallas):
        ecfg = EngineConfig(prefill_buckets=(256,), max_new_tokens=8,
                            use_pallas=use_pallas, capacity_align=8)
        shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, 256)
        return prefill_mod.prefill(params, cfg, mcfg, ecfg, shapes, tokens, n_true)

    ref_logits, ref_cache = run(False)
    with pltpu.force_tpu_interpret_mode():
        logits, cache = run(True)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )
    # identical keep-sets: positions and validity must match exactly
    np.testing.assert_array_equal(np.asarray(cache.pos), np.asarray(ref_cache.pos))
    np.testing.assert_array_equal(np.asarray(cache.valid), np.asarray(ref_cache.valid))
    np.testing.assert_allclose(
        np.asarray(cache.k), np.asarray(ref_cache.k), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("s,count_vals,W", [(256, [256], 8), (384, [300, 130], 8),
                                            (256, [256], 12), (256, [5], 8)])
def test_flash_fused_window_scores(s, count_vals, W):
    """Fused in-kernel TSP/SnapKV scoring must match the XLA scoring pass
    (engine.prefill._window_scores) on the observation-window softmax."""
    from fastkv_tpu.engine import prefill as pf
    from fastkv_tpu.policies import selection

    b, h, kh, d = len(count_vals), 4, 2, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kh, s, d)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    count = jnp.asarray(count_vals, jnp.int32)
    valid = positions < count[:, None]
    state = pf.SeqState(
        h=jnp.zeros((b, s, 8)), positions=positions, valid=valid,
        count=count, n_orig=count,
    )
    win_idx, win_valid = selection.window_indices(count - W, W, count)
    q_win = jnp.take_along_axis(q, win_idx[:, None, :, None], axis=2)
    ref_scores, selectable = pf._window_scores(
        q_win, k, win_idx, win_valid, state, W
    )
    qw_pos = jnp.take_along_axis(positions, win_idx, axis=1)
    qw_pos = jnp.where(win_valid, qw_pos, -1)
    with pltpu.force_tpu_interpret_mode():
        out, scores = flash_attention(
            q, k, v, positions, count, block_q=128, block_k=128,
            window_q=q_win, window_q_pos=qw_pos,
        )
    # apply the same selectable zeroing as the XLA pass
    scores = jnp.where(selectable[:, None, :], scores, 0.0)
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), atol=2e-5, rtol=2e-5
    )
    # attention output unaffected by the fused scoring
    ref_out = att.chunked_causal_attention(
        q, k, v, positions, positions, valid, q_block=64
    )
    for i in range(b):
        vi = np.asarray(valid)[i]
        np.testing.assert_allclose(
            np.asarray(out)[i][:, vi], np.asarray(ref_out)[i][:, vi],
            atol=2e-5, rtol=2e-5,
        )


def test_ring_composition_with_pallas_aux():
    """The ring-attention-with-Pallas path, composed on ONE device.

    XLA's SPMD partitioner cannot shard interpret-mode Pallas (it lowers to an
    io_callback), so ring SP with use_pallas=True cannot run e2e on the
    virtual CPU mesh (tests/test_sp_engine.py covers the XLA-fallback ring
    e2e). This test covers the missing link at the kernel contract level: the
    flash kernel's return_aux=(m, l) statistics, consumed by the ring's
    _merge, must recombine two key chunks (the local 'causal' chunk + one
    rotated-in 'full' chunk with k_positions/k_count) into EXACTLY full
    attention — the same composition parallel/ring_attention.py:partial_attn
    + _merge executes per shard under shard_map.
    """
    from fastkv_tpu.parallel.ring_attention import _merge

    b, h, kh, s, d = 1, 4, 2, 256, 64
    half = s // 2
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kh, s, d)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    count = jnp.asarray([200], jnp.int32)  # partial validity crosses chunk 2
    valid = jnp.arange(s)[None, :] < count[:, None]

    ref = att.chunked_causal_attention(q, k, v, positions, positions, valid,
                                       q_block=64)

    # shard 1's view: local queries = second half, ring holds both k chunks
    q2, pos2 = q[:, :, half:], positions[:, half:]
    k1, v1, pos_k1 = k[:, :, :half], v[:, :, :half], positions[:, :half]
    k2, v2, pos_k2 = k[:, :, half:], v[:, :, half:], positions[:, half:]
    cnt1 = jnp.clip(count - 0, 0, half)      # owner 0
    cnt2 = jnp.clip(count - half, 0, half)   # owner 1 (local)

    with pltpu.force_tpu_interpret_mode():
        o, m, l = flash_attention(
            q2, k2, v2, pos2, count, pattern="causal", return_aux=True,
            k_positions=pos_k2, k_count=cnt2, block_q=128, block_k=128,
        )
        o1, m1, l1 = flash_attention(
            q2, k1, v1, pos2, count, pattern="full", return_aux=True,
            k_positions=pos_k1, k_count=cnt1, block_q=128, block_k=128,
        )
    merged, _, _ = _merge(o, m, l, o1, m1, l1)

    vrows = np.asarray(valid)[0][half:]
    np.testing.assert_allclose(
        np.asarray(merged)[0][:, vrows],
        np.asarray(ref[:, :, half:])[0][:, vrows],
        atol=2e-5, rtol=2e-5,
    )


def test_flash_rectangular_k_hi_matches_reference():
    """Chunked-prefill shape: c chunk queries against a bucket-sized scratch,
    with the dynamic k_hi block gate skipping key blocks beyond the visible
    prefix. Must equal the XLA rectangular mask over the same positions."""
    rng = np.random.default_rng(5)
    b, h, kh, d = 1, 4, 2, 64
    S, c, start, n = 512, 128, 256, 470  # chunk [256, 384) of a 470-token prompt
    q = jnp.asarray(rng.standard_normal((b, h, c, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kh, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kh, S, d)), jnp.float32)
    qpos = (start + jnp.arange(c, dtype=jnp.int32))[None]
    kpos = jnp.arange(S, dtype=jnp.int32)[None]
    kv_count = jnp.asarray([min(start + c, n)], jnp.int32)
    k_valid = kpos < kv_count[:, None]

    ref = att.chunked_causal_attention(
        q, k, v, qpos, kpos, k_valid, q_block=64
    )
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(
            q, k, v, qpos, kv_count, block_q=128, block_k=128,
            k_positions=kpos, k_count=kv_count, k_hi=kv_count,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    # k_hi gating must not change results vs no gate (blocks it skips are
    # fully masked anyway)
    with pltpu.force_tpu_interpret_mode():
        out2 = flash_attention(
            q, k, v, qpos, kv_count, block_q=128, block_k=128,
            k_positions=kpos, k_count=kv_count,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6, rtol=1e-6)
