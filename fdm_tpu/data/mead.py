"""3D MEAD loader (reference datasets/data_loader_mead.py behavior): a CSV
index [pid, emotion, intensity, flame_id, audio_id] filtered to audios
001/002 and intensity level_3; FLAME npz -> (T, 56) = expression(50) +
[zeros(3), jaw(3)]; emotion/speaker one-hots; val = M035/M039,
test = M037/M040, train = the rest."""

from __future__ import annotations

import csv
import os
from typing import Optional

import numpy as np

from fdm_tpu.data.common import DataSplits, SequenceRecord, read_wav

EMOTIONS = [
    "angry", "contempt", "disgusted", "fear", "happy", "sad", "surprised",
]
SPEAKERS = [
    "M003", "M005", "M007", "M009", "M011", "M012", "M013", "M019", "M022",
    "M023", "M024", "M025", "M026", "M027", "M028", "M029", "M030", "M031",
    "M032", "M033", "M034", "M035", "M037", "M039", "M040",
]
VAL_SPEAKERS = {"M035", "M039"}
TEST_SPEAKERS = {"M037", "M040"}

_EMOTION_ALIASES = {
    "angry": "angry", "anger": "angry",
    "contempt": "contempt",
    "disgusted": "disgusted", "disgust": "disgusted",
    "fear": "fear", "fearful": "fear",
    "happy": "happy", "happiness": "happy",
    "sad": "sad", "sadness": "sad",
    "surprised": "surprised", "surprise": "surprised",
    "neutral": "neutral",
}


def emotion_one_hot(label: str) -> np.ndarray:
    """7-way emotion one-hot; 'neutral' maps to all-zeros (the reference
    returns torch.zeros(7), data_loader_mead.py:39-43)."""
    label = _EMOTION_ALIASES[label.lower()]
    if label == "neutral":
        return np.zeros(len(EMOTIONS), np.float32)
    return np.eye(len(EMOTIONS), dtype=np.float32)[EMOTIONS.index(label)]


def speaker_one_hot(pid: str) -> np.ndarray:
    return np.eye(len(SPEAKERS), dtype=np.float32)[SPEAKERS.index(pid)]


def load_flame_params(path: str) -> np.ndarray:
    """npz {expression (T,50), pose (T,>=6)} -> (T,56) with global rotation
    zeroed and jaw kept (reference get_flame, data_loader_mead.py:120-126)."""
    data = np.load(path)  # plain float arrays; no pickle execution
    expr = np.asarray(data["expression"], np.float32)
    jaw = np.asarray(data["pose"], np.float32)[:, 3:6]
    pose = np.concatenate([np.zeros_like(jaw), jaw], axis=1)
    return np.concatenate([expr, pose], axis=1)


def load_mead(
    data_root: str,
    csv_name: str = "mead_v2.csv",
    read_audio: bool = True,
    audio_ids: tuple = ("001.m4a", "002.m4a"),
    intensity: str = "level_3",
    max_records: Optional[int] = None,
) -> DataSplits:
    splits = {"train": [], "val": [], "test": []}
    csv_path = os.path.join(data_root, csv_name)
    with open(csv_path, newline="") as f:
        rows = list(csv.DictReader(f))

    for row in rows:
        if row["audio_id"] not in audio_ids or row["intensity"] != intensity:
            continue
        pid = row["pid"]
        split = (
            "val" if pid in VAL_SPEAKERS
            else "test" if pid in TEST_SPEAKERS else "train"
        )
        if max_records and len(splits[split]) >= max_records:
            continue
        flame_path = os.path.join(
            data_root, "FLAME_ALL", pid,
            f"{pid}-{row['emotion']}-{row['intensity']}-{row['flame_id']}",
        )
        if not os.path.exists(flame_path):
            continue
        params = load_flame_params(flame_path)
        audio = None
        if read_audio:
            audio_path = os.path.join(
                data_root, "AUDIO", pid, row["emotion"], row["intensity"],
                row["audio_id"],
            )
            wav_path = os.path.splitext(audio_path)[0] + ".wav"
            # m4a requires a decode step; we read the .wav the preprocessing
            # CLI produces (fdm_tpu.cli.preprocess)
            if os.path.exists(wav_path):
                audio = read_wav(wav_path)
            elif os.path.exists(audio_path):
                raise ValueError(
                    f"{audio_path}: decode m4a to 16 kHz wav first "
                    "(e.g. ffmpeg -i 001.m4a -ar 16000 -ac 1 001.wav)"
                )
            else:
                continue
        name = f"{pid}_{row['emotion']}_{row['intensity']}_{row['audio_id']}"
        splits[split].append(
            SequenceRecord(
                name=name,
                motion=params,
                template=np.zeros((1, params.shape[1]), np.float32),
                style_one_hot=speaker_one_hot(pid),
                emotion_one_hot=emotion_one_hot(row["emotion"]),
                audio=audio,
            )
        )
    return DataSplits(splits["train"], splits["val"], splits["test"])
