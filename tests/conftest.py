"""Test configuration.

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and overrides ``JAX_PLATFORMS``, but it cannot lock the
platform *list* before any backend initializes — so we pin
``jax_platforms=cpu`` here (same trick as ``dryrun_multichip``). Tests run
entirely on the host CPU backend: no contention with TPU benchmarks on the
single relay chip, no per-dispatch relay round-trips, and `XLA_FLAGS` set
before the CPU client first initializes gives every test 8 virtual devices.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

try:
    from jax._src import xla_bridge

    if not xla_bridge.backends_are_initialized():
        jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - introspection API moved
    pass

# This JAX build truncates f32 matmuls under default precision; pin true-f32
# math so tests can compare against numpy references. Production keeps the
# fast default (AMP-equivalent of the reference's fp16 autocast).
jax.config.update("jax_default_matmul_precision", "float32")


def cpu_devices(n: int = 8):
    devs = jax.devices("cpu")
    assert len(devs) >= n, f"need {n} cpu devices, got {len(devs)}"
    return devs[:n]


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
