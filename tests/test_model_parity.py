"""Ground-truth correctness: our pure-JAX model vs HuggingFace transformers
(torch CPU) on an identical randomly-initialised tiny Llama.

This replaces the reference's implicit correctness gate (its FullKV control rows
in the eval CSVs, eval/eval_longbench.py:113) with an exact logit/token parity
check, per SURVEY.md §4.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine.generate import Engine
from fastkv_tpu.models.llama import params_from_hf_state_dict


def make_hf_tiny(seed=0):
    cfg = ModelConfig.tiny()
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        tie_word_embeddings=False,
        attention_bias=False,
        mlp_bias=False,
        use_cache=True,
    )
    torch.manual_seed(seed)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    return cfg, model


@pytest.fixture(scope="module")
def tiny_pair():
    cfg, hf_model = make_hf_tiny()
    params = params_from_hf_state_dict(cfg, hf_model.state_dict(), dtype="float32")
    return cfg, hf_model, params


def fullkv_engine(cfg, params, bucket=128, max_new=16):
    mcfg = MethodConfig(method=Method.FULLKV)
    ecfg = EngineConfig(
        prefill_buckets=(bucket,), max_new_tokens=max_new, use_pallas=False,
        capacity_align=8,
    )
    return Engine(params, cfg, mcfg, ecfg)


def test_prefill_logits_match_hf(tiny_pair):
    cfg, hf_model, params = tiny_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 60))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits[0, -1].float().numpy()

    eng = fullkv_engine(cfg, params)
    fn = eng.prefill_fn(128, 16)
    toks = np.zeros((1, 128), np.int32)
    toks[0, :60] = ids[0]
    logits, cache = fn(params, toks, np.array([60], np.int32))
    ours = np.asarray(logits)[0]
    np.testing.assert_allclose(ours, hf_logits, atol=2e-3, rtol=1e-3)


def test_greedy_generate_matches_hf(tiny_pair):
    cfg, hf_model, params = tiny_pair
    rng = np.random.default_rng(2)
    for n, seed in [(40, 0), (100, 1)]:
        ids = rng.integers(0, cfg.vocab_size, size=(1, n))
        with torch.no_grad():
            out = hf_model.generate(
                torch.tensor(ids),
                max_new_tokens=12,
                do_sample=False,
                num_beams=1,
                pad_token_id=0,
            )
        hf_new = out[0, n:].tolist()

        eng = fullkv_engine(cfg, params)
        ours = eng.generate([ids[0].tolist()], max_new_tokens=12)[0]
        assert ours == hf_new, f"n={n}: {ours} != {hf_new}"


def test_batched_padded_generation(tiny_pair):
    """Right-padded batch must reproduce per-example results exactly."""
    cfg, hf_model, params = tiny_pair
    rng = np.random.default_rng(3)
    id_a = rng.integers(0, cfg.vocab_size, size=37).tolist()
    id_b = rng.integers(0, cfg.vocab_size, size=90).tolist()
    eng = fullkv_engine(cfg, params)
    batched = eng.generate([id_a, id_b], max_new_tokens=8)
    single_a = eng.generate([id_a], max_new_tokens=8)[0]
    single_b = eng.generate([id_b], max_new_tokens=8)[0]
    assert batched[0] == single_a
    assert batched[1] == single_b
