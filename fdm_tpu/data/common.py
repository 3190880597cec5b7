"""Host-side data plumbing: records, wav IO, bucketed static-shape batching.

Replaces the reference's torch DataLoader + pad_sequence collates
(datasets/data_loader*.py) with numpy-only plumbing that produces
static-shape, mask-carrying batches — XLA recompiles per shape, so sequence
lengths are padded up to multiples of a frame bucket instead of ragged
padding-to-longest (SURVEY.md §7.3 'variable-length sequences vs XLA static
shapes').

Also fixes reference quirk Q2: every dataset loader here returns a dict of
train/valid/test splits (the reference BIWI loader returns a bare DataLoader
that its callers subscript, crashing as checked in).
"""

from __future__ import annotations

import dataclasses
import wave
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class SequenceRecord:
    """One clip: motion (or FLAME params) + conditioning + optional audio."""

    name: str
    motion: np.ndarray                 # (T, D) vertices*3 or flame params
    template: np.ndarray               # (1, D)
    style_one_hot: np.ndarray          # (S,)
    emotion_one_hot: Optional[np.ndarray] = None  # (E,)
    audio: Optional[np.ndarray] = None            # (num_samples,) float32 16 kHz
    text: Optional[str] = None                    # transcript (BIWI raw_text)

    @property
    def num_frames(self) -> int:
        return self.motion.shape[0]


@dataclasses.dataclass
class DataSplits:
    train: List[SequenceRecord]
    valid: List[SequenceRecord]
    test: List[SequenceRecord]

    def __getitem__(self, key: str) -> List[SequenceRecord]:
        return getattr(self, "valid" if key == "val" else key)


def load_npy_f32(path: str) -> np.ndarray:
    """.npy -> float32 array via the native C++ decoder when built
    (fdm_tpu.data.native; handles the datasets' f16/f32/f64 storage), numpy
    otherwise."""
    try:
        from fdm_tpu.data import native

        if native.native_available():
            return native.read_npy(path)
    except Exception:
        pass
    # no allow_pickle: the loaders only read plain numeric arrays, and
    # pickle would execute code from untrusted dataset files (the native
    # fallback rejects object arrays too)
    return np.load(path).astype(np.float32)


def read_wav(path: str, target_sr: int = 16000, normalize: bool = True) -> np.ndarray:
    """Load a wav as mono float32 at target_sr (native PCM16 decoder when
    built, else scipy; the reference uses librosa.load(sr=16000) +
    Wav2Vec2Processor normalization, datasets/data_loader.py:90-97)."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    try:
        from fdm_tpu.data import native

        if native.native_available():
            decoded = native.read_wav_pcm16(path)
            if decoded is not None:
                data, sr = decoded
                if sr != target_sr:
                    g = np.gcd(int(sr), int(target_sr))
                    data = resample_poly(
                        data, target_sr // g, sr // g
                    ).astype(np.float32)
                if normalize:
                    from fdm_tpu.audio.features import normalize_waveform

                    data = normalize_waveform(data)
                return data.astype(np.float32)
    except Exception:
        pass

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if sr != target_sr:
        g = np.gcd(int(sr), int(target_sr))
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
    if normalize:
        from fdm_tpu.audio.features import normalize_waveform

        data = normalize_waveform(data)
    return data.astype(np.float32)


def bucket_frames(num_frames: int, bucket: int, max_frames: int) -> int:
    """Round a sequence length up to the next bucket multiple (capped)."""
    n = min(num_frames, max_frames)
    return int(min(-(-n // bucket) * bucket, max_frames))


def collate_batch(
    records: Sequence[SequenceRecord],
    bucket: int = 64,
    max_frames: int = 600,
    sr: int = 16000,
    fps: int = 25,
    include_audio: bool = False,
) -> Dict[str, np.ndarray]:
    """Pad records to one bucketed length; emit frame_mask. Audio (when
    included) is padded to frames/fps seconds PLUS one conv hop (320
    samples): the wav2vec2/HuBERT VALID conv stack over exactly T/fps
    seconds yields 2T-1 fifty-Hz frames, one short — at fps=25 (BIWI) the
    pairing path would then align every clip's final animation frame with
    a zero-padded audio frame (the reference instead trims motion to
    min(audio, vertice), reference models/fdm.py:75-77). The extra hop
    makes the extractor yield exactly 2T frames (verified over T=1..700
    for the (10,3,3,3,3,2,2)/(5,2,2,2,2,2,2) stack)."""
    T = max(bucket_frames(r.num_frames, bucket, max_frames) for r in records)
    B = len(records)
    D = records[0].motion.shape[1]

    motion = np.zeros((B, T, D), np.float32)
    template = np.zeros((B, 1, D), np.float32)
    mask = np.zeros((B, T), np.float32)
    style = np.stack([r.style_one_hot for r in records]).astype(np.float32)
    batch: Dict[str, np.ndarray] = {}

    for i, r in enumerate(records):
        n = min(r.num_frames, T)
        motion[i, :n] = r.motion[:n]
        template[i] = r.template
        mask[i, :n] = 1.0

    batch.update(
        motion=motion, template=template, frame_mask=mask, style_one_hot=style
    )
    # presence must be batch-consistent: keying off records[0] alone would
    # crash or silently drop fields depending on shuffle order
    have_emo = [r.emotion_one_hot is not None for r in records]
    if any(have_emo) and not all(have_emo):
        raise ValueError(
            "batch mixes records with and without emotion_one_hot"
        )
    have_audio = [r.audio is not None for r in records]
    if include_audio and not all(have_audio):
        # the all-missing case must fail here too, not as a distant
        # KeyError('audio') inside the train/sample step
        raise ValueError(
            "include_audio=True but records carry no audio"
            if not any(have_audio)
            else "batch mixes records with and without audio"
        )
    if all(have_emo):
        batch["emotion_one_hot"] = np.stack(
            [r.emotion_one_hot for r in records]
        ).astype(np.float32)
    if include_audio:
        # one extra 50 Hz conv hop; see docstring
        samples = int(T * sr / fps) + 320
        audio = np.zeros((B, samples), np.float32)
        for i, r in enumerate(records):
            n = min(len(r.audio), samples)
            audio[i, :n] = r.audio[:n]
        batch["audio"] = audio
    return batch


def batch_iterator(
    records: List[SequenceRecord],
    batch_size: int,
    bucket: int = 64,
    max_frames: int = 600,
    sr: int = 16000,
    fps: int = 25,
    include_audio: bool = False,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield collated batches; records are length-sorted within a shuffled
    window so batches share buckets (fewer XLA shape specializations)."""
    order = np.arange(len(records))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
        # sort within windows of 4*batch_size by length to homogenize buckets
        w = max(4 * batch_size, 1)
        chunks = [order[i : i + w] for i in range(0, len(order), w)]
        order = np.concatenate(
            [
                c[np.argsort([records[j].num_frames for j in c])]
                for c in chunks
            ]
        ) if chunks else order
    for i in range(0, len(order), batch_size):
        idx = order[i : i + batch_size]
        if len(idx) < batch_size and drop_last:
            continue
        yield collate_batch(
            [records[j] for j in idx], bucket, max_frames, sr, fps,
            include_audio,
        )
