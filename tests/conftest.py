"""Test config: run JAX on 8 virtual CPU devices so multi-chip sharding logic is
exercised without a pod (SURVEY.md §4 test strategy)."""

import jax

# NOTE: this environment's sitecustomize imports jax with JAX_PLATFORMS=axon
# baked in, so env-var overrides after interpreter start are no-ops — the
# config API is the only reliable switch.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from fastkv_tpu.core.config import ModelConfig

    return ModelConfig.tiny()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
