"""Test config: run everything on CPU with 8 virtual devices so sharding
and collective logic is exercised without a TPU pod (SURVEY.md section 4).

The container's sitecustomize eagerly imports jax and registers the axon
TPU tunnel backend in every interpreter, so env vars alone are too late;
we switch the platform via jax.config and reset any initialized backends.
"""
import numpy as np
import pytest

import jax
from jax._src import xla_bridge

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
try:
    xla_bridge._clear_backends()
except Exception:
    pass
assert jax.devices()[0].platform == 'cpu'
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
