from fdm_tpu.codec.quantizer import QuantizerOutput, quantize, codebook_lookup
from fdm_tpu.codec.vqvae import VQAutoEncoder, tokens_to_frames, frames_to_tokens

__all__ = [
    "QuantizerOutput",
    "quantize",
    "codebook_lookup",
    "VQAutoEncoder",
    "tokens_to_frames",
    "frames_to_tokens",
]
