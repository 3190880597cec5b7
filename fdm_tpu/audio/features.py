"""Host/device audio feature utilities: normalization, padding, frame-rate
alignment between the ~50 Hz encoder stream and the animation frame rate."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize_waveform(wav: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Zero-mean unit-variance utterance normalization — the Wav2Vec2Processor
    behavior the reference applies at load time
    (reference demo/demo_3d_mead.py:85-88, datasets/data_loader.py:90-97)."""
    wav = np.asarray(wav, dtype=np.float32)
    return (wav - wav.mean()) / np.sqrt(wav.var() + eps)


def pad_audio(wav: np.ndarray, sr: int = 16000, seconds: float = 1.0) -> np.ndarray:
    """Append trailing-zero padding (the reference demo pads +1 s so the last
    frames keep audio context, demo/demo_3d_mead.py:96)."""
    return np.concatenate(
        [wav, np.zeros(int(sr * seconds), dtype=np.float32)]
    )


def pair_frames(hidden: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, N, D) 50 Hz -> (B, N//factor, D*factor): the reference's frame
    pairing for 24/25 fps targets (models/fdm_vqvae_mead.py:73). Trims the
    remainder."""
    B, N, D = hidden.shape
    n = (N // factor) * factor
    return hidden[:, :n].reshape(B, n // factor, D * factor)


def linear_interpolate_frames(
    hidden: jnp.ndarray, input_fps: int, output_fps: int,
    output_len: int | None = None,
) -> jnp.ndarray:
    """Time-resample (B, N, D) features with torch
    F.interpolate(mode='linear', align_corners=True) semantics — the
    FaceFormer-style 50 Hz -> 30 fps path the VOCASET variant intends
    (reference models/hubert.py:64-70, quirk Q3)."""
    B, N, D = hidden.shape
    if output_len is None:
        output_len = int(N / float(input_fps) * output_fps)
    if output_len == N:
        return hidden
    if output_len == 1:
        return hidden[:, :1]
    # align_corners=True: positions map [0, N-1] <-> [0, L-1]
    pos = jnp.linspace(0.0, N - 1.0, output_len)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, N - 1)
    w = (pos - lo)[None, :, None]
    return hidden[:, lo] * (1.0 - w) + hidden[:, hi] * w


def align_hidden_frames(hidden: jnp.ndarray, fdm_cfg,
                        num_frames: int) -> jnp.ndarray:
    """Encoder-rate hidden states (B, N, D) -> exactly `num_frames`
    animation frames: 50 Hz -> fps interpolation (VOCASET, quirk Q3) or
    frame pairing (MEAD/BIWI) per the FDM config, then trim-or-zero-pad
    (the reference trims to min(audio, vertice), fdm_vqvae_mead.py:75-77).
    The single alignment policy shared by the training pipeline
    (models/pipeline.py encode_audio) and the CLI AudioFrontend."""
    if fdm_cfg.audio_interp_fps:
        hidden = linear_interpolate_frames(
            hidden, 50, fdm_cfg.audio_interp_fps, output_len=num_frames
        )
    elif fdm_cfg.audio_pair_factor > 1:
        hidden = pair_frames(hidden, fdm_cfg.audio_pair_factor)
    T = hidden.shape[1]
    if T >= num_frames:
        return hidden[:, :num_frames]
    return jnp.pad(hidden, ((0, 0), (0, num_frames - T), (0, 0)))


def frames_for_duration(num_samples: int, sr: int, fps: int) -> int:
    """Animation frame count for a clip (reference demo: len/sr*fps,
    demo/demo_3d_mead.py:104)."""
    return int(num_samples / sr * fps)
