"""Golden-value tests: our static-shape policies vs an independent torch port of
the reference selection math (written from the semantics of
baselines/{fastkv,snapkv,h2o,streamingllm}/utils.py — GQA reduction order,
pooling flavors, fp32 softmax, window handling).

These run with bucket padding (n_true < padded s) to prove the static-shape
reformulation is exact.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fastkv_tpu.core.config import Method, MethodConfig, ModelConfig
from fastkv_tpu.ops import attention as att
from fastkv_tpu.policies import budgets, methods, selection

H, KH, D = 4, 2, 16
G = H // KH


def make_qk(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((1, H, n, D)).astype(np.float32)
    k = rng.standard_normal((1, KH, n, D)).astype(np.float32)
    return q, k


# ---------------------------------------------------------------------------
# torch reference port (semantics of the reference, independently written)
# ---------------------------------------------------------------------------

def ref_window_probs(q, k_rep, window):
    """softmax probs of the last `window` query rows, reference masking:
    triangular mask applied to the window x window corner only, softmax over
    the full row in fp32."""
    n = q.shape[2]
    attn = torch.matmul(q[:, :, -window:, :], k_rep.transpose(2, 3)) / math.sqrt(D)
    corner = torch.full((window, window), torch.finfo(attn.dtype).min)
    corner = torch.triu(corner, diagonal=1)
    attn[:, :, :, -window:] += corner[None, None]
    return F.softmax(attn, dim=-1, dtype=torch.float32)


def ref_pool(x, kernel_size, pooling):
    if pooling == "avgpool":
        return F.avg_pool1d(x, kernel_size=kernel_size, padding=kernel_size // 2, stride=1)
    return F.max_pool1d(x, kernel_size=kernel_size, padding=kernel_size // 2, stride=1)


def ref_snapkv_indices(q, k, window, kernel_size, pooling, cap):
    """Per-repeated-head keep indices (non-window part), snapkv/utils.py:57-102
    with k already repeated (flash path)."""
    k_rep = torch.repeat_interleave(k, G, dim=1)
    probs = ref_window_probs(q, k_rep, window)
    score = probs[:, :, :, : -window].sum(dim=-2)  # [1, H, n-w]
    pooled = ref_pool(score, kernel_size, pooling)
    idx = pooled.topk(cap - window, dim=-1).indices  # [1, H, cap-w]
    return idx[0]  # [H, cap-w]


def ref_fastkv(q, k, window, kernel_size, pooling, cap, tsp_len):
    """Per-kv-head keep indices + tsp indices, fastkv/utils.py:80-134."""
    k_rep = torch.repeat_interleave(k, G, dim=1)
    probs = ref_window_probs(q, k_rep, window)
    score = probs[:, :, :, : -window].sum(dim=-2)
    pooled = ref_pool(score, kernel_size, pooling)
    n = q.shape[2]
    attn_cache = pooled.view(1, KH, G, n - window).sum(dim=-2)  # [1, KH, n-w]
    keep = attn_cache.topk(cap - window, dim=-1).indices[0]  # [KH, cap-w]
    tsp = attn_cache.sum(dim=-2).topk(tsp_len - window, dim=-1).indices  # [1, tsp-w]
    tsp = torch.cat([tsp, torch.arange(n - window, n)[None]], dim=-1)
    tsp, _ = torch.sort(tsp, dim=1)
    return keep, tsp[0]


def ref_h2o_indices(q, k, window, cap):
    """h2o/utils.py:51-89: full-rows softmax with ONLY the window-corner mask."""
    k_rep = torch.repeat_interleave(k, G, dim=1)
    attn = torch.matmul(q, k_rep.transpose(2, 3)) / math.sqrt(D)
    corner = torch.triu(torch.full((window, window), torch.finfo(attn.dtype).min), diagonal=1)
    attn[:, :, -window:, -window:] += corner[None, None]
    probs = F.softmax(attn, dim=-1, dtype=torch.float32)
    score = probs[:, :, :, : -window].sum(dim=-2)  # [1, H, n-w]
    return score.topk(cap - window, dim=-1).indices[0]  # [H, cap-w]


# ---------------------------------------------------------------------------
# helpers to run our policies on a padded layout
# ---------------------------------------------------------------------------

def assert_topk_equivalent(score_vec, ours_idx, ref_idx, atol=1e-5):
    """Tie-robust top-k equality: maxpool plateaus make exact index parity
    depend on torch-vs-XLA tie order; selections are equivalent iff the sorted
    multisets of selected scores match (and cardinalities agree)."""
    assert len(ours_idx) == len(ref_idx)
    np.testing.assert_allclose(
        np.sort(score_vec[np.asarray(ours_idx)]),
        np.sort(score_vec[np.asarray(ref_idx)]),
        atol=atol,
    )


def padded_state(n_true, bucket):
    positions = jnp.arange(bucket, dtype=jnp.int32)[None, :]
    valid = positions < n_true
    return positions, valid


def our_window_scores(q, k, n_true, bucket, window):
    """Pad q/k to bucket and compute window scores [1, H, bucket]."""
    pad = bucket - q.shape[2]
    qp = jnp.pad(jnp.asarray(q), ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(jnp.asarray(k), ((0, 0), (0, 0), (0, pad), (0, 0)))
    positions, valid = padded_state(n_true, bucket)
    n = jnp.array([n_true], jnp.int32)
    win_idx, win_valid = selection.window_indices(n - window, window, n)
    q_win = jnp.take_along_axis(qp, win_idx[:, None, :, None], axis=2)
    from fastkv_tpu.engine.prefill import SeqState, _window_scores

    state = SeqState(h=None, positions=positions, valid=valid, count=n, n_orig=n)
    scores, selectable = _window_scores(q_win, kp, win_idx, win_valid, state, window)
    return scores, selectable, win_idx, win_valid


@pytest.mark.parametrize("pooling", ["avgpool", "maxpool"])
@pytest.mark.parametrize("n_true,bucket", [(96, 96), (96, 128)])
def test_snapkv_keep_matches_reference(pooling, n_true, bucket):
    window, ks, cap = 8, 7, 32
    q, k = make_qk(n_true, seed=1)
    ref_idx = ref_snapkv_indices(
        torch.tensor(q), torch.tensor(k), window, ks, pooling, cap
    ).numpy()

    cfg = ModelConfig.tiny()
    mcfg = MethodConfig(
        method=Method.SNAPKV, window_size=window, kernel_size=ks, pooling=pooling,
        eviction_mode="constant", max_capacity_prompt=cap,
    )
    scores, selectable, win_idx, win_valid = our_window_scores(q, k, n_true, bucket, window)
    k_budget = budgets.dynamic_keep_budget(mcfg, jnp.array([n_true]), False)
    keep = methods.score_based_keep(
        Method.SNAPKV, mcfg, cfg, scores, selectable, win_idx, win_valid,
        k_budget, cap - window,
    )
    ours_idx = np.asarray(keep.idx)[0][:, : cap - window]
    ours_valid = np.asarray(keep.valid)[0][:, : cap - window]
    assert ours_valid.all()
    k_rep = torch.repeat_interleave(torch.tensor(k), G, dim=1)
    probs = ref_window_probs(torch.tensor(q), k_rep, window)
    pooled_ref = ref_pool(probs[:, :, :, :-window].sum(dim=-2), ks, pooling)[0].numpy()
    for h in range(H):
        assert_topk_equivalent(pooled_ref[h], ours_idx[h], ref_idx[h])
    # window part appended and valid
    win_part = np.asarray(keep.idx)[0][:, cap - window :]
    assert (win_part == np.arange(n_true - window, n_true)[None, :]).all()


@pytest.mark.parametrize("n_true,bucket", [(96, 96), (96, 128)])
def test_fastkv_keep_and_tsp_match_reference(n_true, bucket):
    window, ks, cap, tsp_len = 8, 7, 32, 48
    pooling = "maxpool"
    q, k = make_qk(n_true, seed=2)
    ref_keep, ref_tsp = ref_fastkv(
        torch.tensor(q), torch.tensor(k), window, ks, pooling, cap, tsp_len
    )
    cfg = ModelConfig.tiny()
    mcfg = MethodConfig(
        method=Method.FASTKV, window_size=window, kernel_size=ks, pooling=pooling,
        eviction_mode="constant", max_capacity_prompt=cap, tsp_len=tsp_len,
    )
    scores, selectable, win_idx, win_valid = our_window_scores(q, k, n_true, bucket, window)
    k_budget = budgets.dynamic_keep_budget(mcfg, jnp.array([n_true]), False)
    keep = methods.score_based_keep(
        Method.FASTKV, mcfg, cfg, scores, selectable, win_idx, win_valid,
        k_budget, cap - window,
    )
    ours = np.asarray(keep.idx)[0][:, : cap - window]
    k_rep = torch.repeat_interleave(torch.tensor(k), G, dim=1)
    probs = ref_window_probs(torch.tensor(q), k_rep, window)
    pooled = ref_pool(probs[:, :, :, :-window].sum(dim=-2), ks, pooling)
    per_kv_ref = pooled.view(1, KH, G, n_true - window).sum(dim=-2)[0].numpy()
    for kv in range(KH):
        assert_topk_equivalent(per_kv_ref[kv], ours[kv], ref_keep[kv].numpy())

    tsp_budget = budgets.dynamic_tsp_budget(mcfg, jnp.array([n_true]))
    tsp = methods.fastkv_tsp_set(
        mcfg, cfg, scores, selectable, win_idx, win_valid, tsp_budget, 64
    )
    ours_tsp = np.asarray(tsp.idx)[0][np.asarray(tsp.valid)[0]]
    summed_ref = np.concatenate([per_kv_ref.sum(axis=0), np.full(window, 1e9)])
    assert_topk_equivalent(summed_ref, ours_tsp, ref_tsp.numpy(), atol=1e-4)


@pytest.mark.parametrize("n_true,bucket", [(64, 64), (64, 128)])
def test_h2o_keep_matches_reference(n_true, bucket):
    window, cap = 8, 24
    q, k = make_qk(n_true, seed=3)
    ref_idx = ref_h2o_indices(torch.tensor(q), torch.tensor(k), window, cap).numpy()

    cfg = ModelConfig.tiny()
    mcfg = MethodConfig(
        method=Method.H2O, window_size=window, eviction_mode="constant",
        max_capacity_prompt=cap,
    )
    pad = bucket - n_true
    qp = jnp.pad(jnp.asarray(q), ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(jnp.asarray(k), ((0, 0), (0, 0), (0, pad), (0, 0)))
    positions, valid = padded_state(n_true, bucket)
    n = jnp.array([n_true], jnp.int32)
    # h2o consumes repeated keys in the reference; our h2o_scores groups q onto
    # un-repeated k itself
    scores = att.h2o_scores(qp, kp, valid, n, window, row_block=16)
    col_win = positions >= (n[:, None] - window)
    selectable = valid & ~col_win
    win_idx, win_valid = selection.window_indices(n - window, window, n)
    k_budget = budgets.dynamic_keep_budget(mcfg, n, False)
    keep = methods.score_based_keep(
        Method.H2O, mcfg, cfg, scores, selectable, win_idx, win_valid,
        k_budget, cap - window,
    )
    ours = np.asarray(keep.idx)[0][:, : cap - window]
    k_rep = torch.repeat_interleave(torch.tensor(k), G, dim=1)
    attn = torch.matmul(torch.tensor(q), k_rep.transpose(2, 3)) / math.sqrt(D)
    corner = torch.triu(torch.full((window, window), torch.finfo(attn.dtype).min), diagonal=1)
    attn[:, :, -window:, -window:] += corner[None, None]
    score_ref = F.softmax(attn, dim=-1, dtype=torch.float32)[:, :, :, :-window].sum(dim=-2)[0].numpy()
    for h in range(H):
        assert_topk_equivalent(score_ref[h], ours[h], ref_idx[h])


def test_h2o_scores_padded_shape_equivalent():
    """The 8192-bucket XLA-pathology workaround (ops.attention.h2o_scores
    pad_to, ROOFLINE §9) computes in a wider padded shape: padded query rows
    and key columns must contribute exactly zero mass, so scores match the
    unpadded computation to fp32 reduction-order noise and the top-k keep-set
    is unchanged."""
    n_true, bucket = 100, 128
    window = 8
    q, k = make_qk(n_true, seed=11)
    _, valid = padded_state(n_true, bucket)
    pad = bucket - n_true
    qp = jnp.pad(jnp.asarray(q), ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(jnp.asarray(k), ((0, 0), (0, 0), (0, pad), (0, 0)))
    n = jnp.array([n_true], jnp.int32)
    base = att.h2o_scores(qp, kp, valid, n, window, row_block=16)
    padded = att.h2o_scores(qp, kp, valid, n, window, row_block=16, pad_to=256)
    assert padded.shape == base.shape
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(base), rtol=1e-6, atol=1e-6
    )


def test_streamingllm_proportional_keep():
    """proportional: 4 sinks + last (cap-4) tokens, cap = floor(n * retain)."""
    n_true, bucket = 200, 256
    mcfg = MethodConfig(method=Method.STREAMINGLLM, eviction_mode="proportional", retain_rate=0.25)
    cap = int(n_true * 0.25)  # 50
    keep = methods.streamingllm_keep(mcfg, KH, 1, jnp.array([n_true]), 64)
    idx = np.asarray(keep.idx)[0, 0]
    valid = np.asarray(keep.valid)[0, 0]
    assert valid.sum() == cap
    expect = list(range(4)) + list(range(n_true - (cap - 4), n_true))
    np.testing.assert_array_equal(idx[valid], np.array(expect))


def test_streamingllm_short_prompt_keeps_all():
    """Constant mode, n < max_capacity -> keep everything (reference early
    return, streamingllm/utils.py:63-64). Proportional mode can never hit this
    branch since int(n * retain) < n for retain < 1."""
    mcfg = MethodConfig(
        method=Method.STREAMINGLLM, eviction_mode="constant",
        max_capacity_prompt=64, window_size=32,
    )
    keep = methods.streamingllm_keep(mcfg, KH, 1, jnp.array([10]), 64)
    idx = np.asarray(keep.idx)[0, 0]
    valid = np.asarray(keep.valid)[0, 0]
    np.testing.assert_array_equal(idx[valid], np.arange(10))


@pytest.mark.parametrize("pooling", ["avgpool", "maxpool"])
def test_pooling_matches_torch(pooling):
    rng = np.random.default_rng(5)
    x = np.abs(rng.standard_normal((1, 3, 40))).astype(np.float32)
    ref = ref_pool(torch.tensor(x), 7, pooling).numpy()
    ours = att.pool_scores(jnp.asarray(x), jnp.ones((1, 40), bool), 7, pooling)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_proportional_budget_floor_semantics():
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.1, tsp_rate=0.2, window_size=8)
    n = jnp.array([1000, 95, 4096])
    k = budgets.dynamic_keep_budget(mcfg, n, False)
    np.testing.assert_array_equal(np.asarray(k), [100 - 8, 9 - 8, 409 - 8])
    t = budgets.dynamic_tsp_budget(mcfg, n)
    np.testing.assert_array_equal(np.asarray(t), [200 - 8, 19 - 8, 819 - 8])
    # post-tsp layers: retain/tsp_rate of the reduced length
    k2 = budgets.dynamic_keep_budget(mcfg, jnp.array([200]), True)
    np.testing.assert_array_equal(np.asarray(k2), [100 - 8])
