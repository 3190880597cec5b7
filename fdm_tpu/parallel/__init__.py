from fdm_tpu.parallel.fsdp import (
    fsdp_shardings,
    place_fsdp_params,
)
from fdm_tpu.parallel.pipeline import (
    make_pp_denoise,
    stack_decoder_layers,
)
from fdm_tpu.parallel.tensor import (
    fdm_tp_shardings,
    place_tp_params,
)
from fdm_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    seq_sharding,
    shard_batch,
    initialize_distributed,
    local_batch_slice,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "seq_sharding",
    "shard_batch",
    "initialize_distributed",
    "local_batch_slice",
    "fdm_tp_shardings",
    "place_tp_params",
    "fsdp_shardings",
    "place_fsdp_params",
    "make_pp_denoise",
    "stack_decoder_layers",
]
