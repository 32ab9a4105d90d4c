"""checkify NaN/OOB guards (EngineConfig.debug_checks; SURVEY §5 sanitizers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastkv_tpu.core.config import EngineConfig, Method, MethodConfig, ModelConfig
from fastkv_tpu.engine.generate import Engine
from fastkv_tpu.models.llama import init_params


def _engine(params, cfg, debug):
    mcfg = MethodConfig(method=Method.FASTKV, eviction_mode="proportional",
                        retain_rate=0.3, tsp_rate=0.5, tsp_idx=1)
    ecfg = EngineConfig(prefill_buckets=(256,), max_new_tokens=8,
                        use_pallas=False, capacity_align=8, debug_checks=debug)
    return Engine(params, cfg, mcfg, ecfg)


def test_clean_run_passes_under_checks():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    prompt = list(np.random.default_rng(0).integers(0, cfg.vocab_size, 200))
    out = _engine(params, cfg, True).generate([prompt], max_new_tokens=6)[0]
    assert len(out) == 6


def test_nan_weight_row_is_caught():
    """A NaN K-projection row must raise under debug_checks (and silently
    poison the logits without it)."""
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    bad = jax.tree_util.tree_map(lambda x: x, params)
    bad["layers"] = dict(params["layers"])
    wk = np.asarray(params["layers"]["wk"]).copy()
    wk[1, :, 3] = np.nan  # layer 1, one output channel
    bad["layers"]["wk"] = jnp.asarray(wk)
    prompt = list(np.random.default_rng(1).integers(0, cfg.vocab_size, 200))

    with pytest.raises(Exception, match="nan|NaN|not-a-number|divided"):
        _engine(bad, cfg, True).generate([prompt], max_new_tokens=4)

    # without the flag: no exception, garbage propagates
    out = _engine(bad, cfg, False).generate([prompt], max_new_tokens=4)[0]
    assert len(out) == 4
