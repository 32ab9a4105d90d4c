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
    orig_prefill, orig_step = sched._prefill, sched._step
    sched._prefill = lambda *a, **k: (events.append("P"), orig_prefill(*a, **k))[1]
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
