"""Test configuration: run on an 8-device virtual CPU mesh.

Must set the env vars before importing jax (cdsegnet_tpu imports jax).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# This JAX build truncates f32 matmuls under default precision even on CPU;
# pin true-f32 math so tests can compare against numpy references. Production
# keeps the fast default (AMP-equivalent of the reference's fp16 autocast).
jax.config.update("jax_default_matmul_precision", "float32")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
