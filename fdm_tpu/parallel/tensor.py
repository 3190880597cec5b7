"""Tensor-parallel sharding rules for the FDM denoiser.

The original system is single-GPU and its models are small enough that data
parallelism alone covers the training budget (SURVEY.md §2.5), so TP is an
OPTIONAL scaling axis here, not a parity requirement. The rules follow the
standard Megatron split for a transformer block:

  q/k/v projections   : kernel (D, D)    sharded on the output dim (heads)
  attention out       : kernel (D, D)    sharded on the input (contracting)
                        dim — XLA inserts the psum
  ffn linear1         : kernel (D, F)    output dim
  ffn linear2         : kernel (F, D)    input dim
  everything else     : replicated

Applied by placement (`jax.device_put` with NamedShardings): jit then
propagates the shardings through the step and inserts the collectives —
no model-code changes, the same FDM module runs 1-device, DP, or DP x TP.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf, model_axis: str) -> P:
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(names)
    ndim = getattr(leaf, "ndim", 0)
    if "layer_" not in joined or ndim == 0:
        return P()
    last = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    if parent in ("q", "k", "v") or parent == "linear1":
        if last == "kernel" and ndim == 2:
            return P(None, model_axis)
        if last == "bias" and ndim == 1:
            return P(model_axis)
    if parent == "out" or parent == "linear2":
        if last == "kernel" and ndim == 2:
            return P(model_axis, None)
        # bias replicated (added after the psum)
    return P()


def fdm_tp_shardings(fdm_params, mesh: Mesh, model_axis: str = "model"):
    """Pytree of NamedShardings mirroring fdm_params (Megatron-style)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for(path, leaf, model_axis)
        ),
        fdm_params,
    )


def place_tp_params(fdm_params, mesh: Mesh, model_axis: str = "model"):
    """device_put the FDM params with tensor-parallel shardings."""
    shardings = fdm_tp_shardings(fdm_params, mesh, model_axis)
    return jax.tree_util.tree_map(jax.device_put, fdm_params, shardings)
