from fdm_tpu.audio.encoder import AudioEncoder, AudioEncoderConfig
from fdm_tpu.audio.features import (
    normalize_waveform,
    pad_audio,
    pair_frames,
    linear_interpolate_frames,
)

__all__ = [
    "AudioEncoder",
    "AudioEncoderConfig",
    "normalize_waveform",
    "pad_audio",
    "pair_frames",
    "linear_interpolate_frames",
]
