"""VOCASET loader (reference datasets/data_loader_vocaset.py behavior):
wav/ + vertices_npy/ + templates.pkl, fixed FaceTalk subject splits (8 train /
2 val / 2 test), sentences 1-40 train and 21-40 val/test, vertices
downsampled 60 -> 30 fps with [::2]."""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from fdm_tpu.data.common import (
    DataSplits,
    SequenceRecord,
    load_npy_f32,
    read_wav,
)

TRAIN_SUBJECTS = (
    "FaceTalk_170728_03272_TA FaceTalk_170904_00128_TA "
    "FaceTalk_170725_00137_TA FaceTalk_170915_00223_TA "
    "FaceTalk_170811_03274_TA FaceTalk_170913_03279_TA "
    "FaceTalk_170904_03276_TA FaceTalk_170912_03278_TA"
).split()
VAL_SUBJECTS = "FaceTalk_170811_03275_TA FaceTalk_170908_03277_TA".split()
TEST_SUBJECTS = "FaceTalk_170809_00138_TA FaceTalk_170731_00024_TA".split()

SENTENCE_SPLITS = {
    "train": range(1, 41),
    "val": range(21, 41),
    "test": range(21, 41),
}


def load_vocaset(
    data_root: str,
    read_audio: bool = True,
    max_records: Optional[int] = None,
) -> DataSplits:
    wav_dir = os.path.join(data_root, "wav")
    vert_dir = os.path.join(data_root, "vertices_npy")
    with open(os.path.join(data_root, "templates.pkl"), "rb") as f:
        templates = pickle.load(f, encoding="latin1")

    one_hot = np.eye(len(TRAIN_SUBJECTS), dtype=np.float32)
    splits = {"train": [], "val": [], "test": []}

    files = sorted(os.listdir(wav_dir)) if os.path.isdir(wav_dir) else []
    for fname in files:
        if not fname.endswith(".wav"):
            continue
        key = fname[:-4]
        subject = "_".join(key.split("_")[:-1])
        try:
            sentence = int(key.split("sentence")[-1])
        except ValueError:
            continue
        vert_path = os.path.join(vert_dir, key + ".npy")
        if not os.path.exists(vert_path):
            continue

        for split, subjects in (
            ("train", TRAIN_SUBJECTS), ("val", VAL_SUBJECTS),
            ("test", TEST_SUBJECTS),
        ):
            if subject in subjects and sentence in SENTENCE_SPLITS[split]:
                if max_records and len(splits[split]) >= max_records:
                    continue
                verts = load_npy_f32(vert_path)[::2]  # 60 -> 30 fps
                verts = verts.reshape(verts.shape[0], -1)
                template = np.asarray(
                    templates[subject], np.float32
                ).reshape(1, -1)
                # train: subject one-hot; val/test subjects are unseen — the
                # sampler conditions on each train subject in turn
                # (reference samples/sample_diffusion_vocaset.py:71-73), so
                # records carry the first train identity as a default
                style = (
                    one_hot[TRAIN_SUBJECTS.index(subject)]
                    if subject in TRAIN_SUBJECTS else one_hot[0]
                )
                audio = (
                    read_wav(os.path.join(wav_dir, fname))
                    if read_audio else None
                )
                splits[split].append(
                    SequenceRecord(
                        name=key, motion=verts, template=template,
                        style_one_hot=style, audio=audio,
                    )
                )
    return DataSplits(splits["train"], splits["val"], splits["test"])
