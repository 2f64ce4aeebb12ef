"""Device mesh helpers for data-parallel training over ICI.

The reference scales with DDP/NCCL (`pointcept/engines/launch.py:36-137`);
the TPU-native equivalent is a 1-D `jax.sharding.Mesh` over the "data" axis
with `shard_map`: gradients are averaged with `psum` riding ICI, parameters
stay replicated. Multi-host setups extend the same mesh over all processes
(`jax.distributed.initialize` + `mesh_utils.create_device_mesh`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = device axis (one collated bucket per device)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def num_local_devices() -> int:
    return jax.local_device_count()
