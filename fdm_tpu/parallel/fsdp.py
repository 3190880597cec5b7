"""FSDP / ZeRO-3-style parameter + optimizer-state sharding.

The reference is single-GPU with no distributed support at all (SURVEY.md
§2.5), so — like tensor parallelism — this is an optional TPU-native scaling
axis, not a parity requirement. It matters when the training state (params +
Adam moments, 3x params) outgrows one chip's HBM: every parameter leaf is
sharded over the 'data' axis along its largest divisible dimension, the Adam
moments inherit the same placement (optax init uses zeros_like, which
preserves shardings), and XLA's SPMD partitioner turns the annotations into
the ZeRO schedule automatically: all-gather the shard group before use in
forward/backward, reduce-scatter the gradients, update each shard locally.
No model or train-step code changes — placement only, exactly like
fdm_tpu.parallel.tensor.

Memory: params + moments drop to 1/N per chip. Collectives ride ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, axis_size: int, axis_name: str) -> P:
    """Shard the largest dimension divisible by the axis size; replicate
    leaves too small or indivisible (biases, scalars, tiny embeddings)."""
    shape = getattr(leaf, "shape", ())
    ndim = len(shape)
    if ndim == 0:
        return P()
    for d in sorted(range(ndim), key=lambda i: shape[i], reverse=True):
        if shape[d] >= axis_size and shape[d] % axis_size == 0:
            spec = [None] * ndim
            spec[d] = axis_name
            return P(*spec)
    return P()


def fsdp_shardings(params, mesh: Mesh, axis_name: str = "data"):
    """Pytree of NamedShardings mirroring `params` (ZeRO-3 placement)."""
    axis_size = int(mesh.shape[axis_name])
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, _leaf_spec(leaf, axis_size, axis_name)
        ),
        params,
    )


def place_fsdp_params(params, mesh: Mesh, axis_name: str = "data"):
    """device_put every parameter leaf with its FSDP sharding. A TrainState
    built from the result (create_train_state) carries sharded Adam moments
    for free, and the existing jitted train steps run unchanged."""
    shardings = fsdp_shardings(params, mesh, axis_name)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
