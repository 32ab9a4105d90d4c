"""GemFilter two-pass tests: selection math vs an independent torch port, and
end-to-end generation through the Engine."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine.generate import Engine
from fastkv_tpu.models.llama import init_params


def ref_gemfilter_indices(q_last, k, topk):
    """Reference selection (gemfilter/utils.py:25-56): last-query inner product,
    summed over heads, avg-pooled (kernel 5), topk, sorted ascending."""
    g = q_last.shape[1] // k.shape[1]
    k_rep = torch.repeat_interleave(k, g, dim=1)
    ip = torch.matmul(q_last, k_rep.transpose(-1, -2))[:, :, 0, :]  # [1, H, s]
    ip = ip.sum(dim=1, keepdim=True)
    ip = F.avg_pool1d(ip, kernel_size=5, padding=2, stride=1)
    idx = torch.topk(ip, topk, dim=-1).indices[0, 0]
    return torch.sort(idx).values.numpy()


def test_selection_matches_reference():
    from fastkv_tpu.engine import gemfilter
    from fastkv_tpu.ops import attention as att
    from fastkv_tpu.policies import selection

    rng = np.random.default_rng(0)
    H, KH, D, n = 4, 2, 16, 96
    q_last = rng.standard_normal((1, H, 1, D)).astype(np.float32)
    k = rng.standard_normal((1, KH, n, D)).astype(np.float32)
    topk = 24
    ref_idx = ref_gemfilter_indices(torch.tensor(q_last), torch.tensor(k), topk)

    # our scoring path (mirrors select_tokens internals on an unpadded layout)
    qg = jnp.asarray(q_last).reshape(1, KH, H // KH, D)
    scores = jnp.einsum("bkgd,bksd->bks", qg, jnp.asarray(k)).sum(axis=1, keepdims=True)
    valid = jnp.ones((1, n), bool)
    pooled = att.pool_scores(scores, valid, kernel_size=5, pooling="avgpool")
    idx, v = selection.topk_select(pooled, valid, jnp.array([topk]), topk)
    keep = np.sort(np.asarray(idx)[0, 0])
    np.testing.assert_array_equal(keep, ref_idx)


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(
        method=Method.GEMFILTER, eviction_mode="proportional",
        retain_rate=0.4, filter_idx=1,
    )
    ecfg = EngineConfig(prefill_buckets=(256,), max_new_tokens=8,
                        use_pallas=False, capacity_align=8)
    return Engine(params, cfg, mcfg, ecfg), cfg, params


def test_gemfilter_generates(tiny_engine):
    eng, cfg, params = tiny_engine
    prompt = list(np.random.default_rng(1).integers(0, cfg.vocab_size, 200))
    out = eng.generate([prompt], max_new_tokens=6)[0]
    assert len(out) == 6
    # first token should match a fullkv run on the *reduced* prompt by
    # construction; sanity: deterministic across calls
    out2 = eng.generate([prompt], max_new_tokens=6)[0]
    assert out == out2


def test_gemfilter_constant_short_prompt(tiny_engine):
    eng, cfg, params = tiny_engine
    import dataclasses

    mcfg = dataclasses.replace(eng.mcfg, eviction_mode="constant", max_capacity_prompt=64)
    eng2 = Engine(params, cfg, mcfg, eng.ecfg)
    prompt = list(np.random.default_rng(2).integers(0, cfg.vocab_size, 40))
    out = eng2.generate([prompt], max_new_tokens=4)[0]
    assert len(out) == 4
