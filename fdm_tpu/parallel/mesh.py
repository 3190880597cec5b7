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


def seq_sharding(mesh: Mesh, axis: str = "seq") -> NamedSharding:
    """Sequence parallelism: shard the frame/token (second) axis of
    (B, T, C) activations over `axis`. Annotating the audio features at the
    generate() boundary is enough — XLA propagates the sharding through the
    sampler scan, inserts the attention collectives, and keeps frame-local
    ops (codec conv/linears, quantizer) fully local. Useful when one clip's
    frames outgrow a chip (the single-chip answer to >600 frames is the
    streaming flash kernel, SURVEY.md §5.7; SP spreads the same work over
    ICI instead)."""
    return NamedSharding(mesh, P(None, axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put every array in a batch pytree with its leading axis sharded
    across the mesh. Leading dim must divide by the mesh axis size."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host setup for pod slices: call once per host before any jax
    use; jax.devices() then spans the whole slice and make_mesh() builds a
    global mesh (collectives ride ICI within a slice, DCN across slices —
    SURVEY.md §5.8). On TPU pods the arguments auto-detect from the
    environment; returns the process index. No-op for single-process runs."""
    # NB: jax.process_count()/jax.devices() must NOT run before
    # jax.distributed.initialize — they initialize the backend and the
    # cluster can no longer form. Try to initialize first.
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        already = "called once" in str(e)
        if explicit and not already:
            # an explicitly requested cluster that fails to form is an
            # error, not a single-process fallback
            raise
        # auto-detect path: single-process / already initialized / no
        # cluster env: fine
    # only check the cluster size when the caller actually pinned it —
    # coordinator_address alone with env-provided counts is a valid pattern
    if num_processes is not None and jax.process_count() != num_processes:
        raise RuntimeError(
            f"distributed init formed {jax.process_count()} processes, "
            f"expected {num_processes} — was the backend already "
            f"initialized before initialize_distributed()?"
        )
    return jax.process_index()


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a globally-indexed batch this host should feed (per-host
    data loading for multi-host DP)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
