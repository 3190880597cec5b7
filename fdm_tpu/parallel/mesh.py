"""Device-mesh utilities for data-parallel (and future multi-axis) training.

The reference has no distributed support at all (single hardcoded 'cuda:1',
SURVEY.md §2.5); this module is new TPU-native design surface: a 1-D
Mesh(('data',)) over the chips of a slice, params replicated, batches sharded
on the leading axis. Gradient reduction happens inside jit via XLA's
automatic partitioning — collectives ride ICI, no NCCL-style code.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over available devices. Default: all devices on one
    'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put every array in a batch pytree with its leading axis sharded
    across the mesh. Leading dim must divide by the mesh axis size."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
