"""Pallas TPU kernel: fused codebook nearest-neighbor search.

The VQ quantizer's hot op is the (B*L, N) distance computation + argmin
against the codebook (reference VectorQuantizer.forward,
models/lib/quantizer.py:35-63; emotion-sliced fork vq_vae_emotion.py:221-252).
XLA materializes the full distance matrix in HBM between the matmul and the
argmin; this kernel fuses -2zE^T (MXU) + ||e||^2 + partition masking + argmin
per row-tile so distances never leave VMEM. ||z||^2 is a per-row constant and
is dropped — it cannot change the argmin.

The emotion partition is an additive mask computed from a per-row partition
id (static-shape, batch-heterogeneous emotions fine), matching
fdm_tpu.codec.quantizer semantics.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fdm_tpu.kernels._util import LANE as _LANE, round_up as _round_up

_ROW_BLOCK = 256


def _check_partition_args(partition_ids, partitions: int) -> None:
    """partition_ids and partitions must be given together — the default
    partitions=0 would hit N // 0 at trace time with a bare
    ZeroDivisionError, and partitions>0 alone would silently search the
    WHOLE codebook instead of the caller's emotion slice."""
    if partition_ids is not None and partitions <= 0:
        raise ValueError(
            "partition_ids requires partitions > 0 (the number of equal "
            "codebook slices, e.g. EVQ emotion_partitions)"
        )
    if partition_ids is None and partitions > 0:
        raise ValueError(
            "partitions > 0 requires partition_ids (per-row slice "
            "selectors); omitting them would silently search the whole "
            "codebook"
        )


def _nn_kernel(z_ref, e_ref, e2_ref, part_ref, idx_ref, *, slice_size: int,
               n_valid: int):
    z = z_ref[:].astype(jnp.float32)          # (BM, Dp)
    e = e_ref[:].astype(jnp.float32)          # (Np, Dp)
    M = z.shape[0]
    Np = e.shape[0]

    # d(m, n) = ||e_n||^2 - 2 z_m . e_n   (||z||^2 dropped: row-constant)
    d = e2_ref[:].reshape(1, Np) - 2.0 * jax.lax.dot_general(
        z, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    col = jax.lax.broadcasted_iota(jnp.int32, (M, Np), 1)
    invalid = col >= n_valid
    if slice_size > 0:
        entry_part = col // slice_size
        invalid = invalid | (entry_part != part_ref[:].reshape(M, 1))
    d = jnp.where(invalid, jnp.inf, d)

    idx_ref[:] = jnp.argmin(d, axis=1).astype(jnp.int32).reshape(M, 1)


def nearest_code_pallas(
    z: jnp.ndarray,                   # (M, D)
    codebook: jnp.ndarray,            # (N, D)
    partition_ids: Optional[jnp.ndarray] = None,   # (M,) int32
    partitions: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Global argmin indices (M,) int32 of ||z - e||^2 over codebook rows."""
    _check_partition_args(partition_ids, partitions)
    M, D = z.shape
    N = codebook.shape[0]
    Mp = _round_up(M, _ROW_BLOCK)
    Dp = _round_up(D, _LANE)
    Np = _round_up(N, _LANE)

    zp = jnp.pad(z, ((0, Mp - M), (0, Dp - D)))
    ep = jnp.pad(codebook, ((0, Np - N), (0, Dp - D)))
    e2 = jnp.sum(
        ep.astype(jnp.float32) * ep.astype(jnp.float32), axis=-1
    ).reshape(1, Np)
    if partition_ids is None:
        part = jnp.zeros((Mp, 1), jnp.int32)
        slice_size = 0
    else:
        part = jnp.pad(
            partition_ids.astype(jnp.int32).reshape(M, 1),
            ((0, Mp - M), (0, 0)),
        )
        slice_size = N // partitions

    kernel = functools.partial(
        _nn_kernel, slice_size=slice_size, n_valid=N
    )
    grid = (Mp // _ROW_BLOCK,)
    idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, Dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_BLOCK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Dp,
            bytes_accessed=(Mp * Dp + Np * Dp + Mp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(zp, ep, e2, part)
    return idx.reshape(Mp)[:M]


def nearest_code(
    z: jnp.ndarray,
    codebook: jnp.ndarray,
    partition_ids: Optional[jnp.ndarray] = None,
    partitions: int = 0,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Nearest codebook entry per row of z; auto-dispatches Pallas on TPU."""
    _check_partition_args(partition_ids, partitions)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return nearest_code_pallas(z, codebook, partition_ids, partitions)
    # XLA fallback, same math
    d = (
        jnp.sum(codebook * codebook, axis=-1)[None, :]
        - 2.0 * z @ codebook.T
    )
    if partition_ids is not None:
        N = codebook.shape[0]
        slice_size = N // partitions
        entry_part = jnp.arange(N)[None, :] // slice_size
        d = jnp.where(
            entry_part != partition_ids.astype(jnp.int32)[:, None], jnp.inf, d
        )
    return jnp.argmin(d, axis=1).astype(jnp.int32)
