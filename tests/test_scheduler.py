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
