from fdm_tpu.ops.basic import (
    fill_padding_with_edge,
    hw_dropout_key,
    instance_norm_1d,
    masked_mean,
    mish,
    replicate_pad_1d,
)
from fdm_tpu.ops.positional import (
    sinusoidal_table,
    periodic_positional_encoding,
    reference_batch_pe_offset,
)
from fdm_tpu.ops.masks import alibi_biased_mask, enc_dec_diagonal_allowed, length_mask

__all__ = [
    "fill_padding_with_edge",
    "hw_dropout_key",
    "masked_mean",
    "mish",
    "instance_norm_1d",
    "replicate_pad_1d",
    "sinusoidal_table",
    "periodic_positional_encoding",
    "reference_batch_pe_offset",
    "alibi_biased_mask",
    "enc_dec_diagonal_allowed",
    "length_mask",
]
