"""Chunked prefill admission (engine.chunked): token parity + stall bound.

VERDICT r3 task 5: split admission prefill into bucket-sized chunks interleaved
with decode steps so the max inter-token stall is one chunk, not one full
prefill. The reference has no scheduler at all (batch-1 offline,
benchmark/e2e.py:55-56) — this is new TPU serving scope."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine import chunked, prefill as prefill_mod
from fastkv_tpu.engine.scheduler import Scheduler
from fastkv_tpu.models.llama import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny(num_layers=4)
    params = init_params(cfg, seed=0)
    return cfg, params


def mk_mcfg(method):
    return MethodConfig(
        method=method, eviction_mode="proportional", retain_rate=0.3,
        tsp_rate=0.5, tsp_idx=1, window_size=8,
    )


ECFG_KW = dict(prefill_buckets=(256,), use_pallas=False, capacity_align=8)


@pytest.mark.parametrize(
    "method,kv_int8",
    [
        (Method.FULLKV, False),
        (Method.FASTKV, False),
        (Method.FASTKV, True),  # int8 cache: finish must quantize identically
        (Method.SNAPKV, False),
        (Method.STREAMINGLLM, False),
    ],
)
def test_chunk_pipeline_matches_monolithic_prefill(setup, method, kv_int8):
    """The chunk_step/finish pipeline reproduces engine.prefill exactly:
    same logits, same cache contents (keep-sets included)."""
    cfg, params = setup
    mcfg = mk_mcfg(method)
    ecfg = EngineConfig(kv_int8=kv_int8, **ECFG_KW)
    shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, 256)
    rng = np.random.default_rng(3)
    n = 201  # not a chunk multiple: exercises the partial last chunk
    prompt = rng.integers(0, cfg.vocab_size, n).tolist()

    tokens = np.zeros((1, 256), np.int32)
    tokens[0, :n] = prompt
    ref_logits, ref_cache = prefill_mod.prefill(
        params, cfg, mcfg, ecfg, shapes, jnp.asarray(tokens),
        jnp.asarray([n], jnp.int32),
    )

    progs = chunked.make_programs(cfg, mcfg, ecfg, shapes, chunk=64)
    adm = chunked.start_admission(progs, slot=0, req=None, prompt=prompt)
    out = None
    steps = 0
    while out is None:
        out = chunked.advance(progs, params, adm)
        steps += 1
    assert steps == 4  # ceil(201/64) chunks; later pad chunks skipped
    logits, cache = out

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    assert np.array_equal(np.asarray(cache.valid), np.asarray(ref_cache.valid))
    assert np.array_equal(np.asarray(cache.pos), np.asarray(ref_cache.pos))
    mask = np.asarray(ref_cache.valid)[..., None]
    np.testing.assert_allclose(
        np.asarray(cache.k) * mask, np.asarray(ref_cache.k) * mask,
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(cache.v) * mask, np.asarray(ref_cache.v) * mask,
        rtol=2e-3, atol=2e-3,
    )


def test_chunk_pipeline_sliding_window_matches_monolithic():
    """Mistral-style sliding window: the chunk attention's SWA masking (by
    layout index, engine.prefill._mask_positions semantics) must reproduce
    the monolithic prefill exactly."""
    cfg = ModelConfig.tiny(num_layers=4, sliding_window=64)
    params = init_params(cfg, seed=1)
    mcfg = mk_mcfg(Method.FASTKV)
    ecfg = EngineConfig(**ECFG_KW)
    shapes = prefill_mod.plan_shapes(cfg, mcfg, ecfg, 256)
    rng = np.random.default_rng(9)
    n = 230  # > sliding_window: the window actually truncates attention
    prompt = rng.integers(0, cfg.vocab_size, n).tolist()

    tokens = np.zeros((1, 256), np.int32)
    tokens[0, :n] = prompt
    ref_logits, ref_cache = prefill_mod.prefill(
        params, cfg, mcfg, ecfg, shapes, jnp.asarray(tokens),
        jnp.asarray([n], jnp.int32),
    )
    progs = chunked.make_programs(cfg, mcfg, ecfg, shapes, chunk=64)
    adm = chunked.start_admission(progs, slot=0, req=None, prompt=prompt)
    out = None
    while out is None:
        out = chunked.advance(progs, params, adm)
    logits, cache = out
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    assert np.array_equal(np.asarray(cache.valid), np.asarray(ref_cache.valid))
    assert np.array_equal(np.asarray(cache.pos), np.asarray(ref_cache.pos))


def test_chunk_pipeline_flash_path_matches_xla(setup):
    """use_pallas=True routes chunk attention through the rectangular flash
    kernel with the k_hi gate (interpret mode on CPU); results must match the
    XLA chunk path bit-for-bit in selection and closely in values."""
    from jax.experimental.pallas import tpu as pltpu

    cfg, params = setup
    mcfg = mk_mcfg(Method.FASTKV)
    shapes = prefill_mod.plan_shapes(cfg, mcfg, EngineConfig(**ECFG_KW), 256)
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, cfg.vocab_size, 201).tolist()

    def run(use_pallas):
        ecfg = EngineConfig(**{**ECFG_KW, "use_pallas": use_pallas})
        progs = chunked.make_programs(cfg, mcfg, ecfg, shapes, chunk=64)
        adm = chunked.start_admission(progs, slot=0, req=None, prompt=prompt)
        out = None
        while out is None:
            out = chunked.advance(progs, params, adm)
        return out

    logits_x, cache_x = run(False)
    with pltpu.force_tpu_interpret_mode():
        logits_p, cache_p = run(True)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_x), rtol=5e-4, atol=5e-4
    )
    assert np.array_equal(np.asarray(cache_p.valid), np.asarray(cache_x.valid))
    assert np.array_equal(np.asarray(cache_p.pos), np.asarray(cache_x.pos))


@pytest.mark.parametrize("method", [Method.FASTKV, Method.SNAPKV])
def test_scheduler_chunked_token_parity(setup, method):
    """Scheduler output is identical with and without chunked admission —
    the late request admits chunk-wise while the first decodes."""
    cfg, params = setup
    mcfg = mk_mcfg(method)
    rng = np.random.default_rng(4)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (230, 201, 140)]

    def run(chunk):
        ecfg = EngineConfig(prefill_chunk=chunk, **ECFG_KW)
        sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=256,
                          max_new_tokens=24)
        # staggered budgets: slot 1 frees while slot 0 still decodes, so the
        # third request admits through the chunked path
        for p, mnt in zip(prompts, (24, 6, 12)):
            sched.submit(p, max_new_tokens=mnt)
        done = sched.run()
        return {r.req_id: r.tokens for r in done}, sched.events

    ref, _ = run(None)
    got, events = run(64)
    assert got == ref
    assert any(e[0] == "chunk" for e in events)  # chunked path exercised


def test_scheduler_interleaves_decode_between_chunks(setup):
    """Stall bound: while a request is decoding, admission work between two of
    its decode steps is at most ONE chunk (+ the finish step) — never two
    chunks back-to-back, never a monolithic prefill."""
    cfg, params = setup
    mcfg = mk_mcfg(Method.FASTKV)
    ecfg = EngineConfig(prefill_chunk=32, **ECFG_KW)
    rng = np.random.default_rng(5)
    sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=256,
                      max_new_tokens=24)
    first = sched.submit(list(rng.integers(0, cfg.vocab_size, 100)), max_new_tokens=24)
    # filler occupies slot 2 during the idle-admission phase, then retires
    # quickly so the late arrival admits through the CHUNKED path while
    # `first` is still decoding
    filler = sched.submit(list(rng.integers(0, cfg.vocab_size, 40)), max_new_tokens=2)
    late = sched.submit(list(rng.integers(0, cfg.vocab_size, 230)), max_new_tokens=4)
    done = {r.req_id: r for r in sched.run()}
    assert set(done) == {first, filler, late}

    ev = sched.events
    # the late request must have been admitted in >= 2 chunks
    n_chunks = sum(1 for e in ev if e[0] == "chunk")
    assert n_chunks >= 2, ev
    # monolithic prefills only during the idle-admission phase (first+filler)
    assert sum(1 for e in ev if e[0] == "prefill") == 2, ev
    # between consecutive decode steps: at most one chunk
    gap = 0
    for e in ev:
        if e[0] == "decode":
            gap = 0
        elif e[0] == "chunk":
            gap += 1
            assert gap <= 1, ev


def test_chunk_decode_steps_amortization(setup):
    """chunk_decode_steps=K runs K decode steps per admission chunk (only
    ~1/K of a running request's inter-token gaps pay a chunk — ROOFLINE §7),
    with unchanged tokens."""
    cfg, params = setup
    mcfg = mk_mcfg(Method.FASTKV)
    rng = np.random.default_rng(12)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (100, 230)]

    def run(k):
        ecfg = EngineConfig(prefill_chunk=64, chunk_decode_steps=k, **ECFG_KW)
        sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=256,
                          max_new_tokens=48)
        sched.submit(prompts[0], max_new_tokens=48)
        sched.submit(prompts[1], max_new_tokens=4)
        done = {r.req_id: r.tokens for r in sched.run()}
        return done, list(sched.events)

    ref, ev1 = run(1)
    got, ev3 = run(3)
    assert got == ref  # tokens invariant to the interleave ratio

    def decode_runs_between_chunks(ev):
        """Lengths of consecutive-decode runs strictly between chunk events."""
        runs, cur, seen_chunk = [], 0, False
        for e in ev:
            if e[0] == "chunk":
                if seen_chunk:
                    runs.append(cur)
                cur, seen_chunk = 0, True
            elif e[0] == "decode" and seen_chunk:
                cur += 1
        return runs

    assert all(r == 1 for r in decode_runs_between_chunks(ev1)), ev1
    assert all(r == 3 for r in decode_runs_between_chunks(ev3)), ev3


def test_chunked_admission_respects_unsupported_method(setup):
    """H2O falls back to monolithic admission (needs full attention mass)."""
    cfg, params = setup
    mcfg = mk_mcfg(Method.H2O)
    ecfg = EngineConfig(prefill_chunk=64, **ECFG_KW)
    rng = np.random.default_rng(6)
    sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=256,
                      max_new_tokens=6)
    assert not sched._chunk_ok
    sched.submit(list(rng.integers(0, cfg.vocab_size, 120)))
    (req,) = sched.run()
    assert len(req.tokens) == 6
