"""Dataset loaders against synthetic on-disk layouts: split assignment,
shape/one-hot contracts, VOCASET 60->30 fps downsample, MEAD FLAME param
assembly, and the bucketed collate."""

import os
import pickle

import numpy as np
import pytest

from fdm_tpu.data import (
    collate_batch,
    load_biwi,
    load_mead,
    load_vocaset,
)
from fdm_tpu.data.mead import emotion_one_hot, load_flame_params

rng = np.random.RandomState(0)
V = 4  # tiny vertex count


def _write_wav(path, seconds=0.5, sr=16000):
    from scipy.io import wavfile

    wavfile.write(
        path, sr, (rng.randn(int(seconds * sr)) * 8000).astype(np.int16)
    )


@pytest.fixture(scope="module")
def vocaset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vocaset")
    os.makedirs(root / "wav")
    os.makedirs(root / "vertices_npy")
    subjects = {
        "FaceTalk_170728_03272_TA": [1, 21],   # train subject
        "FaceTalk_170809_00138_TA": [21, 40],  # test subject
        "FaceTalk_170811_03275_TA": [25],      # val subject
    }
    templates = {}
    for sub, sentences in subjects.items():
        templates[sub] = rng.randn(V, 3).astype(np.float32)
        for s in sentences:
            key = f"{sub}_sentence{s:02d}"
            _write_wav(str(root / "wav" / f"{key}.wav"))
            np.save(
                str(root / "vertices_npy" / f"{key}.npy"),
                rng.randn(20, V * 3).astype(np.float32),  # 60 fps, 20 frames
            )
    with open(root / "templates.pkl", "wb") as f:
        pickle.dump(templates, f)
    return str(root)


def test_vocaset_loader(vocaset_root):
    splits = load_vocaset(vocaset_root, read_audio=True)
    # train subject sentence 1 + 21 -> both train (sentences 1-40)
    assert len(splits.train) == 2
    # test subject: sentences 21 and 40 both in 21-40
    assert len(splits.test) == 2
    assert len(splits.valid) == 1
    rec = splits.train[0]
    assert rec.motion.shape == (10, V * 3)  # 60 -> 30 fps [::2]
    assert rec.template.shape == (1, V * 3)
    assert rec.style_one_hot.shape == (8,)
    assert rec.audio is not None and rec.audio.ndim == 1


@pytest.fixture(scope="module")
def biwi_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("biwi")
    os.makedirs(root / "wav")
    os.makedirs(root / "vertices_npy")
    templates = {}
    cases = [("F2", 1), ("F2", 37), ("F1", 39), ("M3", 36)]
    for sub, s in cases:
        templates.setdefault(sub, rng.randn(V, 3).astype(np.float32))
        key = f"{sub}_{s:02d}"
        _write_wav(str(root / "wav" / f"{key}.wav"))
        np.save(
            str(root / "vertices_npy" / f"{key}.npy"),
            rng.randn(12, V * 3).astype(np.float16),  # ref stores fp16
        )
    with open(root / "templates.pkl", "wb") as f:
        pickle.dump(templates, f)
    return str(root)


def test_biwi_loader(biwi_root):
    splits = load_biwi(biwi_root, read_audio=False)
    # F2_01, M3_36 train; F2_37 val (train subject, sentence 37-40);
    # F1_39 test (test subject)
    assert {r.name for r in splits.train} == {"F2_01", "M3_36"}
    assert {r.name for r in splits.valid} == {"F2_37"}
    assert {r.name for r in splits.test} == {"F1_39"}
    rec = splits.train[0]
    assert rec.motion.dtype == np.float32
    assert rec.style_one_hot.shape == (6,)


@pytest.fixture(scope="module")
def mead_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mead")
    rows = [
        ("M003", "happy", "level_3", "001", "001.m4a"),    # train
        ("M035", "angry", "level_3", "002", "002.m4a"),    # val
        ("M037", "sad", "level_3", "003", "001.m4a"),      # test
        ("M003", "happy", "level_2", "004", "001.m4a"),    # filtered: intensity
        ("M003", "happy", "level_3", "005", "003.m4a"),    # filtered: audio id
    ]
    with open(root / "mead_v2.csv", "w") as f:
        f.write("pid,emotion,intensity,flame_id,audio_id\n")
        for r in rows:
            f.write(",".join(r) + "\n")
    for pid, emo, inten, fid, aid in rows:
        flame_dir = root / "FLAME_ALL" / pid
        os.makedirs(flame_dir, exist_ok=True)
        np.savez(
            str(flame_dir / f"{pid}-{emo}-{inten}-{fid}"),
            expression=rng.randn(9, 50).astype(np.float32),
            pose=rng.randn(9, 6).astype(np.float32),
        )
        audio_dir = root / "AUDIO" / pid / emo / inten
        os.makedirs(audio_dir, exist_ok=True)
        _write_wav(str(audio_dir / (os.path.splitext(aid)[0] + ".wav")))
    # npz appends .npz — the loader expects the exact path from the csv
    for base, dirs, files in os.walk(root / "FLAME_ALL"):
        for fn in files:
            if fn.endswith(".npz"):
                os.rename(os.path.join(base, fn),
                          os.path.join(base, fn[:-4]))
    return str(root)


def test_mead_loader(mead_root):
    splits = load_mead(mead_root, read_audio=True)
    assert len(splits.train) == 1 and len(splits.valid) == 1
    assert len(splits.test) == 1
    rec = splits.train[0]
    assert rec.motion.shape == (9, 56)
    # global rotation zeroed, jaw kept
    np.testing.assert_array_equal(rec.motion[:, 50:53], 0.0)
    assert rec.emotion_one_hot.argmax() == 4  # happy
    assert rec.style_one_hot.argmax() == 0    # M003
    assert rec.template.shape == (1, 56)


def test_emotion_one_hot_neutral_is_zeros():
    assert emotion_one_hot("neutral").sum() == 0
    assert emotion_one_hot("happiness").argmax() == 4
    assert emotion_one_hot("ANGER").argmax() == 0


def test_flame_params_assembly(tmp_path):
    path = str(tmp_path / "p.npz")
    np.savez(path, expression=np.ones((3, 50), np.float32),
             pose=np.arange(18, dtype=np.float32).reshape(3, 6))
    params = load_flame_params(path)
    assert params.shape == (3, 56)
    np.testing.assert_array_equal(params[:, 50:53], 0.0)       # global zeroed
    np.testing.assert_array_equal(params[0, 53:], [3, 4, 5])   # jaw kept


def test_collate_bucket_and_mask(vocaset_root):
    splits = load_vocaset(vocaset_root, read_audio=True)
    batch = collate_batch(splits.train, bucket=8, max_frames=64, fps=30,
                          include_audio=True)
    B, T, D = batch["motion"].shape
    assert T % 8 == 0 and D == V * 3
    np.testing.assert_array_equal(
        batch["frame_mask"].sum(axis=1),
        [min(r.num_frames, T) for r in splits.train],
    )
    # +320: one extra 50 Hz conv hop so the VALID conv stack yields a full
    # pair_factor*T frames instead of 2T-1 (no zero-audio final frame)
    assert batch["audio"].shape == (B, int(T * 16000 / 30) + 320)
    # the conv arithmetic itself: exactly 2T frames from the padded length
    def conv_frames(S, layers=((10, 5), (3, 2), (3, 2), (3, 2), (3, 2),
                               (2, 2), (2, 2))):
        for k, s in layers:
            S = (S - k) // s + 1
        return S

    for t in (8, 25, 600):
        assert conv_frames(int(t * 16000 / 25) + 320) == 2 * t
        assert conv_frames(int(t * 16000 / 25)) == 2 * t - 1  # the old bug
