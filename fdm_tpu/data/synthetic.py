"""Synthetic dataset generation: shape-faithful random records for any
pipeline config — used by tests, CI smoke runs, and `--synthetic` CLI modes
so every entry point runs end-to-end without the (license-gated) datasets.

Two modes:

- ``noise`` (default): iid Gaussian motion and audio. Validates shapes and
  plumbing; by construction nothing audio->motion is learnable, so
  convergence runs on it only exercise the pipeline.
- ``correlated``: motion is a DETERMINISTIC function of the audio — a
  speech-like amplitude envelope drives a per-style articulation direction
  (plus an envelope-velocity direction and a constant emotion offset), the
  same local-to-global structure the real datasets carry (jaw/lip motion
  tracks acoustic energy). Because ``envelope_to_motion(frame_rms_envelope
  (audio)) == motion`` exactly, ground truth is recomputable from ANY audio
  clip, which gives a matched-vs-mismatched control: a model that actually
  learned the audio->motion correspondence scores far better against its own
  clip's map than against another clip's. This is the strongest learning
  evidence available without the license-gated datasets (PARITY.md "Known
  gaps").
"""

from __future__ import annotations

import functools

import numpy as np

from fdm_tpu.configs import PipelineConfig
from fdm_tpu.data.common import DataSplits, SequenceRecord

# fixed global seed for the audio->motion map so train/eval/control all see
# the SAME map (it is part of the synthetic task definition, not the data)
_MAP_SEED = 20260818


def frame_rms_envelope(
    audio: np.ndarray, num_frames: int, fps: int, sr: int
) -> np.ndarray:
    """Per-video-frame RMS energy of a waveform, peak-normalized to [0, 1].

    The frame k window is samples [floor(k*sr/fps), floor((k+1)*sr/fps)) —
    computable from the audio alone, so the correlated ground-truth motion
    can be recomputed for any clip (matched or control)."""
    bounds = (np.arange(num_frames + 1, dtype=np.float64) * sr / fps)
    bounds = bounds.astype(np.int64)
    sq = np.concatenate([[0.0], np.cumsum(audio.astype(np.float64) ** 2)])
    n = np.maximum(bounds[1:] - bounds[:-1], 1)
    lo = np.minimum(bounds[:-1], len(audio))
    hi = np.minimum(bounds[1:], len(audio))
    env = np.sqrt(np.maximum(sq[hi] - sq[lo], 0.0) / n)
    peak = env.max()
    if peak > 0:
        env = env / peak
    return env.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _motion_basis(
    dim: int, style_classes: int, emotion_classes: int, flame_space: bool
):
    """Fixed articulation directions for the audio->motion map: one primary
    (envelope-tracking) and one secondary (envelope-velocity) direction per
    style, plus a constant offset per emotion.

    Sized and SHAPED like real articulation (round-4 redesign). The round-3
    map sprayed a small magnitude over a random unit direction across the
    whole space, which after the FLAME expression basis left a vertex-space
    temporal std of ~5e-4 — 3x BELOW the trained codec's ~1.3e-3 recon
    floor, so stage 2 had nothing representable to learn (the round-3
    rehearsal's null result, VERDICT r3 item 1). Real speech concentrates
    ~1e-2-scale displacement at the jaw/lips; this map does the same:

    - FLAME space (MEAD): primary = shared jaw-open rotation (0.3 rad on
      the jaw axis-angle dims, the dominant speech articulator) + an O(1)
      per-style expression mixture; velocity and emotion live in the
      expression dims. Global rotation stays zero.
    - vertex space (BIWI/VOCASET): all directions are supported on one
      shared seeded "lip region" of ~6% of the coordinates, scaled so the
      in-region per-coordinate amplitude is ~1e-2 (real lip articulation
      scale in meters), instead of 1e-3 smeared over the whole face.
    """
    g = np.random.RandomState(_MAP_SEED)

    def unit_rows(n, d):
        rows = g.randn(n, d)
        return (rows / np.linalg.norm(rows, axis=1, keepdims=True)).astype(
            np.float32
        )

    if flame_space:
        # layout per geometry/flame.py params_to_vertices: expr(50) +
        # [global(3), jaw(3)]; articulate expression + jaw, never global
        n_expr = dim - 6

        def expr_rows(n, scale):
            rows = np.zeros((n, dim), np.float32)
            rows[:, :n_expr] = unit_rows(n, n_expr) * scale
            return rows

        primary = expr_rows(style_classes, 1.0)
        primary[:, n_expr + 3] += 0.3  # shared jaw-open component
        velocity = expr_rows(style_classes, 0.3)
        emotion = (
            expr_rows(emotion_classes, 0.5)
            if emotion_classes else np.zeros((0, dim), np.float32)
        )
        return primary, velocity, emotion

    # the region draw uses its own stream (and is sorted) so that when the
    # region covers the whole space (tiny test configs) the row draws below
    # consume g exactly as the round-3 map did — keeping the tiny e2e
    # learning test's fixed-seed numerics unchanged
    region = np.sort(
        np.random.RandomState(_MAP_SEED + 1).choice(
            dim, size=min(dim, max(64, int(dim * 0.06))), replace=False
        )
    )

    def region_rows(n, per_coord_amp):
        # total norm floored at 0.1 so tiny test configs (where the region
        # IS the whole space) keep a learnable scale
        rows = np.zeros((n, dim), np.float32)
        rows[:, region] = unit_rows(n, len(region)) * max(
            0.1 * per_coord_amp / 0.01,
            per_coord_amp * np.sqrt(len(region)),
        )
        return rows

    primary = region_rows(style_classes, 0.01)
    velocity = region_rows(style_classes, 0.003)
    emotion = (
        region_rows(emotion_classes, 0.003)
        if emotion_classes else np.zeros((0, dim), np.float32)
    )
    return primary, velocity, emotion


def envelope_to_motion(
    env: np.ndarray,
    style_one_hot: np.ndarray,
    emotion_one_hot,
    config: PipelineConfig,
) -> np.ndarray:
    """The deterministic audio->motion map of the correlated synthetic task:
    motion[t] = env[t]*primary_dir(style) + denv[t]*velocity_dir(style)
    + emotion_offset. Applies in FLAME-param space for MEAD and vertex
    space otherwise (same spaces the real loaders feed)."""
    ds = config.dataset
    dim = ds.flame_param_dim if ds.uses_flame_params else ds.in_dim
    primary, velocity, emotion = _motion_basis(
        dim, ds.style_classes, ds.emotion_classes, ds.uses_flame_params
    )
    s = int(np.argmax(style_one_hot))
    env = env.astype(np.float32)
    denv = np.gradient(env).astype(np.float32)
    motion = np.outer(env, primary[s]) + np.outer(denv, velocity[s])
    if ds.emotion_classes and emotion_one_hot is not None:
        motion = motion + emotion[int(np.argmax(emotion_one_hot))]
    return motion.astype(np.float32)


def _speech_like_audio(
    rng: np.random.RandomState, num_frames: int, fps: int, sr: int
) -> np.ndarray:
    """A waveform with speech-like syllable-rate (≈3 Hz) energy bumps over
    a harmonic+noise carrier — enough temporal structure for an encoder to
    recover the envelope, nothing more."""
    dur = num_frames / fps
    n = int(dur * sr)
    t = np.arange(n) / sr
    env = np.zeros(n)
    for _ in range(max(2, int(dur * 3))):
        center = rng.uniform(0, dur)
        width = rng.uniform(0.06, 0.18)
        amp = rng.uniform(0.3, 1.0)
        env += amp * np.exp(-0.5 * ((t - center) / width) ** 2)
    env = np.clip(env, 0.0, 1.0)
    f0 = rng.uniform(100.0, 160.0)
    carrier = sum(
        (0.6 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 6.28))
        for k in range(3)
    )
    carrier = carrier + 0.3 * rng.randn(n)
    return (0.15 * env * carrier).astype(np.float32)


def synthetic_splits(
    config: PipelineConfig,
    num_train: int = 8,
    num_eval: int = 2,
    min_frames: int = 40,
    max_frames: int = 120,
    seed: int = 0,
    with_audio: bool = True,
    mode: str = "noise",
) -> DataSplits:
    if mode not in ("noise", "correlated"):
        raise ValueError(f"unknown synthetic mode {mode!r}")
    rng = np.random.RandomState(seed)
    ds = config.dataset
    dim = ds.flame_param_dim if ds.uses_flame_params else ds.in_dim

    def make(i: int, tag: str) -> SequenceRecord:
        T = int(rng.randint(min_frames, max_frames + 1))
        motion = (rng.randn(T, dim) * 0.01).astype(np.float32)
        template = (
            np.zeros((1, dim), np.float32)
            if ds.uses_flame_params
            else (rng.randn(1, dim) * 0.01).astype(np.float32)
        )
        style = np.eye(ds.style_classes, dtype=np.float32)[
            i % ds.style_classes
        ]
        emotion = (
            np.eye(ds.emotion_classes, dtype=np.float32)[
                i % ds.emotion_classes
            ]
            if ds.emotion_classes else None
        )
        # the rng draw happens UNCONDITIONALLY: `with_audio` may only
        # control whether the waveform is attached, never the rng stream.
        # When it gated the draw itself, read_audio=False callers
        # (sample-vqvae) and read_audio=True callers (train-diffusion,
        # correlation) generated DIFFERENT records under the SAME names
        # from the second record on — every cross-CLI comparison scored
        # predictions against another universe's ground truth, which is
        # exactly how the round-3/4 stage-1 roundtrip gates "failed" on a
        # codec that actually tracks its inputs at corr 0.99.
        noise_audio = (
            rng.randn(int(T / ds.fps * ds.audio_sr)) * 0.1
        ).astype(np.float32)
        audio = noise_audio if with_audio else None
        if mode == "correlated":
            # the motion is a function of the audio, so the waveform is
            # generated regardless and only ATTACHED when requested
            wav = _speech_like_audio(rng, T, ds.fps, ds.audio_sr)
            env = frame_rms_envelope(wav, T, ds.fps, ds.audio_sr)
            motion = envelope_to_motion(env, style, emotion, config)
            audio = wav if with_audio else None
        return SequenceRecord(
            name=f"synthetic_{tag}_{i:03d}",
            motion=motion,
            template=template,
            style_one_hot=style,
            emotion_one_hot=emotion,
            audio=audio,
        )

    return DataSplits(
        train=[make(i, "train") for i in range(num_train)],
        valid=[make(i, "val") for i in range(num_eval)],
        test=[make(i, "test") for i in range(num_eval)],
    )
