"""Synthetic dataset generation: shape-faithful random records for any
pipeline config — used by tests, CI smoke runs, and `--synthetic` CLI modes
so every entry point runs end-to-end without the (license-gated) datasets."""

from __future__ import annotations

import numpy as np

from fdm_tpu.configs import PipelineConfig
from fdm_tpu.data.common import DataSplits, SequenceRecord


def synthetic_splits(
    config: PipelineConfig,
    num_train: int = 8,
    num_eval: int = 2,
    min_frames: int = 40,
    max_frames: int = 120,
    seed: int = 0,
    with_audio: bool = True,
) -> DataSplits:
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
        audio = (
            (rng.randn(int(T / ds.fps * ds.audio_sr)) * 0.1).astype(np.float32)
            if with_audio else None
        )
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
