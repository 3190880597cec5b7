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


def shard_batch(batch, mesh: Mesh, axis: str = "data",
                scan_leading: bool = False):
    """Device-put every array in a batch pytree with its leading axis sharded
    across the mesh. Leading dim must divide by the mesh axis size.

    `scan_leading`: the pytree is a (K, B, ...) multi-step stack
    (train.make_multi_step) — the SECOND axis is the batch; the leading
    scan axis stays replicated.

    Single-process: a plain device_put with the named sharding. Multi-host:
    each process passes only its LOCAL rows (see local_batch_slice) and the
    global array is assembled with make_array_from_process_local_data —
    device_put with a global sharding cannot stitch per-host shards and
    would feed wrong rows or crash."""
    sharding = (
        NamedSharding(mesh, P(None, axis)) if scan_leading
        else batch_sharding(mesh, axis)
    )
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


_CLUSTER_ENV_MARKERS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def _cluster_env_present() -> bool:
    """True when the environment advertises a MULTI-host cluster (the
    markers jax's auto-detection reads). TPU_WORKER_HOSTNAMES counts only
    when it names more than one host — single-chip images set it to
    'localhost'."""
    import os

    if any(os.environ.get(k) for k in _CLUSTER_ENV_MARKERS):
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h.strip()]) > 1


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
        if not already and _cluster_env_present():
            # the environment advertises a multi-host cluster but init
            # failed: falling back silently would run N independent
            # single-host trainings writing conflicting checkpoints
            raise RuntimeError(
                "jax.distributed.initialize failed although cluster "
                "environment variables are set — refusing the silent "
                f"single-process fallback ({e})"
            ) from e
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
    n_proc = jax.process_count()
    if global_batch % n_proc:
        # silent floor division would permanently drop the tail rows from
        # every epoch on every host
        raise ValueError(
            f"global_batch={global_batch} must divide by "
            f"process_count={n_proc}"
        )
    per = global_batch // n_proc
    start = per * jax.process_index()
    return slice(start, start + per)
