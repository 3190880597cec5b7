"""BIWI loader (reference datasets/data_loader.py behavior, with quirk Q2
fixed — a dict of splits instead of a bare DataLoader): wav/ + vertices_npy/ +
templates.pkl + raw_text/, subjects F2-F4/M3-M5 train (6 identities),
sentences 1-36 train and 37-40 val/test."""

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

TRAIN_SUBJECTS = "F2 F3 F4 M3 M4 M5".split()
VAL_SUBJECTS = "F2 F3 F4 M3 M4 M5".split()
TEST_SUBJECTS = "F1 F5 F6 F7 F8 M1 M2 M6".split()

SENTENCE_SPLITS = {
    "train": range(1, 37),
    "val": range(37, 41),
    "test": range(37, 41),
}


def load_biwi(
    data_root: str,
    read_audio: bool = True,
    read_text: bool = False,
    max_records: Optional[int] = None,
) -> DataSplits:
    wav_dir = os.path.join(data_root, "wav")
    vert_dir = os.path.join(data_root, "vertices_npy")
    text_dir = os.path.join(data_root, "raw_text")
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
            sentence = int(key[-2:])
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
                verts = load_npy_f32(vert_path)
                verts = verts.reshape(verts.shape[0], -1)
                template = np.asarray(
                    templates[subject], np.float32
                ).reshape(1, -1)
                style = (
                    one_hot[TRAIN_SUBJECTS.index(subject)]
                    if subject in TRAIN_SUBJECTS else one_hot[0]
                )
                audio = (
                    read_wav(os.path.join(wav_dir, fname))
                    if read_audio else None
                )
                rec = SequenceRecord(
                    name=key, motion=verts, template=template,
                    style_one_hot=style, audio=audio,
                )
                if read_text:
                    txt = os.path.join(text_dir, key + ".txt")
                    if os.path.exists(txt):
                        rec.text = open(txt).read()
                splits[split].append(rec)
    return DataSplits(splits["train"], splits["val"], splits["test"])
