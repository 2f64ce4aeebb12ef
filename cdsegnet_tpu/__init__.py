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

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
