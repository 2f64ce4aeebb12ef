"""CDSegNet-TPU: a TPU-native (JAX/XLA/Pallas) point-cloud semantic segmentation
framework with the capabilities of CDSegNet / Pointcept (CVPR'25).

The framework rebuilds, TPU-first, the reference stack described in SURVEY.md:

- serialized (space-filling-curve) point-cloud representation with *static*
  padded shapes instead of ragged offset indexing,
- the dual-branch Point Transformer V3 backbone with the Conditional-Noise
  Framework (CNF) diffusion training rules and single-step inference,
- the Pointcept-style engine (registry/config/trainer/tester/hooks) on top of
  pjit/shard_map data parallelism over a TPU mesh.

Serialization codes are int64; we therefore enable x64 support globally.
All floating point model state remains float32/bfloat16 by explicit dtype
discipline (enforced by tests).
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# This image's sitecustomize registers the axon TPU plugin at interpreter
# start and overrides JAX_PLATFORMS, so `JAX_PLATFORMS=cpu python ...` still
# lands on the TPU. CDSEG_PLATFORM pins the platform *list* before any
# backend initializes (same trick as tests/conftest.py), which the
# sitecustomize cannot lock. Example: CDSEG_PLATFORM=cpu for host-only runs
# of tools/train.py / tools/test.py.
_platform = os.environ.get("CDSEG_PLATFORM")
if _platform:
    try:
        from jax._src import xla_bridge as _xb

        if not _xb.backends_are_initialized():
            jax.config.update("jax_platforms", _platform)
    except Exception:  # pragma: no cover - introspection API moved
        pass

# Persistent compilation cache: the flagship forward graph is large (~60
# serialized-attention blocks) and cold compiles are minutes on the remote
# toolchain; cache compiled executables across processes. Opt out with
# CDSEG_NO_COMPILE_CACHE=1.
if (
    not os.environ.get("CDSEG_NO_COMPILE_CACHE")
    # never persist XLA:CPU AOT results: they bake in host vector features
    # and can SIGILL when loaded on a different machine (the multi-chip
    # dryrun re-execs with JAX_PLATFORMS=cpu). Enable only when a TPU-class
    # platform is explicitly selected — an env check alone would still
    # persist CPU executables on machines where CPU is the default.
    and any(
        t in os.environ.get("JAX_PLATFORMS", "")
        for t in ("tpu", "axon")
    )
    and "cpu" not in os.environ.get("JAX_PLATFORMS", "")
):
    _cache_dir = os.environ.get(
        "CDSEG_COMPILE_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

__version__ = "0.1.0"
