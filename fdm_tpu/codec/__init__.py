from fdm_tpu.codec.quantizer import (
    QuantizerOutput,
    codebook_lookup,
    get_distances,
    quantize,
    sample_logits,
)
from fdm_tpu.codec.vqvae import (
    VQAutoEncoder,
    downsample_frame_mask,
    frames_to_tokens,
    tokens_to_frames,
)

__all__ = [
    "QuantizerOutput",
    "get_distances",
    "sample_logits",
    "quantize",
    "codebook_lookup",
    "VQAutoEncoder",
    "tokens_to_frames",
    "frames_to_tokens",
    "downsample_frame_mask",
]
