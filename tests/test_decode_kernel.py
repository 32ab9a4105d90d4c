"""Pallas decode-attention kernel vs the XLA reference implementation.

Interpreter mode on CPU (SURVEY.md §4 test strategy); the compiled path is
exercised by bench.py on the real chip.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from fastkv_tpu.ops import attention as att
from fastkv_tpu.ops.experimental.decode_attn import decode_attention as pallas_decode


def run_case(b, h, ch, C, d, valid_mask, q_pos=None, k_pos=None,
             sliding_window=None, block_c=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, ch, C, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, ch, C, d)), jnp.float32)
    valid = jnp.asarray(valid_mask)
    qp = None if q_pos is None else jnp.asarray(q_pos, jnp.int32)
    kp = None if k_pos is None else jnp.asarray(k_pos, jnp.int32)

    ref = att.decode_attention(
        q, k, v, valid, q_pos=qp, k_pos=kp, sliding_window=sliding_window
    )
    with pltpu.force_tpu_interpret_mode():
        out = pallas_decode(
            q, k, v, valid, q_pos=qp, k_pos=kp,
            sliding_window=sliding_window, block_c=block_c,
        )
    return np.asarray(out), np.asarray(ref)


def test_decode_gqa_scattered_valid():
    """Compressed-cache layout: scattered validity, GQA grouping."""
    rng = np.random.default_rng(1)
    b, h, ch, C, d = 2, 8, 2, 384, 64
    valid = rng.random((b, C)) < 0.6
    valid[:, 0] = True
    out, ref = run_case(b, h, ch, C, d, valid)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_decode_per_head_cache():
    """SnapKV/H2O per-query-head cache layout: ch == h, per-head validity."""
    rng = np.random.default_rng(2)
    b, h, C, d = 1, 4, 256, 64
    valid = rng.random((b, h, C)) < 0.5
    valid[..., 0] = True
    out, ref = run_case(b, h, h, C, d, valid)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_decode_partial_block():
    """C not a multiple of block_c: explicit padding path."""
    b, h, ch, C, d = 1, 8, 4, 200, 64
    valid = np.arange(C)[None, :] < 150
    out, ref = run_case(b, h, ch, C, d, valid, block_c=128)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_decode_sliding_window():
    """Mistral-style SWA masking by original position ids."""
    b, h, ch, C, d = 2, 4, 2, 256, 64
    n = np.array([220, 140])
    valid = np.arange(C)[None, :] < n[:, None]
    k_pos = np.broadcast_to(np.arange(C)[None, None, :], (b, ch, C)).copy()
    q_pos = n  # decode token sits at position n
    out, ref = run_case(
        b, h, ch, C, d, valid, q_pos=q_pos, k_pos=k_pos, sliding_window=96
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_decode_step_pallas_matches_xla(tiny_cfg):
    """Full decode_step with the kernel enabled == the XLA decode_step."""
    import jax

    from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig
    from fastkv_tpu.engine import decode as dm
    from fastkv_tpu.engine import prefill as pm
    from fastkv_tpu.models.llama import init_params

    cfg = tiny_cfg
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.25, tsp_rate=0.5, tsp_idx=1, window_size=4,
                        kernel_size=5)
    ecfg = EngineConfig(prefill_buckets=(128,), max_new_tokens=8,
                        use_pallas=False, capacity_align=8)
    shapes = pm.plan_shapes(cfg, mcfg, ecfg, 128)
    params = init_params(cfg, seed=0)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 128)))
    n = jnp.array([100], jnp.int32)
    logits, cache = pm.prefill(params, cfg, mcfg, ecfg, shapes, tokens, n)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    pos = n
    slot = jnp.int32(shapes.prefill_capacity)
    lx, _ = dm.decode_step(params, cfg, mcfg, cache, tok, pos, slot, use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        lp, _ = dm.decode_step(params, cfg, mcfg, cache, tok, pos, slot, use_pallas=True)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lp), atol=5e-4, rtol=5e-4)
