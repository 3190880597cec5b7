"""Dependency-free AVI (RIFF) muxer: MJPEG video + interleaved PCM audio.

The reference's final visualization artifact is a VIDEO WITH AUDIO: it
shells out to ffmpeg twice (reference render/render.py:146-153 — re-encode
to yuv420p, then mux the wav). This image ships no ffmpeg binary, so the
with-audio render path would silently degrade to a silent mp4. This module
writes the classic AVI 1.0 container by hand instead: an 'MJPG' video
stream (cv2-encoded JPEG per frame) and a 16-bit PCM audio stream,
interleaved frame by frame, with a standard idx1 index. Every mainstream
player (VLC/mpv/ffplay, cv2.VideoCapture) reads it; no external binary or
library beyond cv2's JPEG encoder is needed.
"""

from __future__ import annotations

import io
import os
import struct
from typing import Iterable, Optional

import numpy as np

_AVIF_HASINDEX = 0x10
_AVIF_ISINTERLEAVED = 0x100
_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """A RIFF chunk: fourcc + size + payload, padded to an even byte."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def _video_strl(w: int, h: int, fps: int, n_frames: int,
                max_chunk: int) -> bytes:
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG",
        0, 0, 0, 0,           # flags, priority, language, initial frames
        1, fps,               # scale, rate -> fps frames/s
        0, n_frames,          # start, length (frames)
        max_chunk,            # suggested buffer size
        0xFFFFFFFF, 0,        # quality (default), sample size (varies)
        0, 0, w, h,           # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    return _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))


def _audio_strl(sample_rate: int, n_samples: int, max_chunk: int) -> bytes:
    block_align = 2  # mono s16
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"auds", b"\x00\x00\x00\x00",
        0, 0, 0, 0,
        block_align, sample_rate * block_align,  # scale, rate -> bytes/s
        0, n_samples,                            # start, length (blocks)
        max_chunk,
        0xFFFFFFFF, block_align,                 # quality, sample size
        0, 0, 0, 0,
    )
    strf = struct.pack(
        "<HHIIHH",
        1, 1, sample_rate, sample_rate * block_align, block_align, 16,
    )
    return _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))


def encode_jpeg_frames(frames: Iterable[np.ndarray],
                       quality: int = 92) -> "list[bytes]":
    """RGB uint8 frames -> JPEG bytes via cv2 (the only encoder used)."""
    import cv2

    out = []
    flags = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    for frame in frames:
        ok, buf = cv2.imencode(".jpg", np.asarray(frame)[..., ::-1], flags)
        if not ok:
            raise RuntimeError("cv2 JPEG encode failed")
        out.append(buf.tobytes())
    return out


def write_avi_mjpeg(
    path: str,
    jpeg_frames: "list[bytes]",
    fps: int,
    size: "tuple[int, int]",
    audio: Optional[np.ndarray] = None,
    sample_rate: int = 16000,
) -> int:
    """Write pre-encoded JPEG frames (and optional mono audio) as one AVI.

    `size` is (width, height); `audio` is float in [-1, 1] or int16, mono.
    Audio is sliced into per-video-frame PCM chunks ('01wb') interleaved
    after each '00dc' JPEG chunk — the layout AVI players expect for lip
    sync — with any tail samples appended to the final chunk. Returns the
    number of video frames written.
    """
    w, h = size
    n = len(jpeg_frames)
    pcm = None
    if audio is not None and len(audio) and n:
        a = np.asarray(audio)
        if a.dtype != np.int16:
            a = np.clip(np.asarray(a, np.float32), -1.0, 1.0)
            a = (a * 32767.0).astype(np.int16)
        if a.ndim > 1:  # (T, C) -> mono
            a = a.mean(axis=1).astype(np.int16)
        pcm = a

    # per-frame audio spans: sample i*sr/fps .. (i+1)*sr/fps, tail into last
    spans = []
    if pcm is not None:
        edges = [int(round(i * sample_rate / fps)) for i in range(n + 1)]
        edges[-1] = max(edges[-1], len(pcm))  # tail samples ride the last chunk
        spans = [
            pcm[min(edges[i], len(pcm)):min(edges[i + 1], len(pcm))]
            for i in range(n)
        ]

    movi = io.BytesIO()
    index = []  # (fourcc, unpadded size, offset of fourcc rel. to 'movi' tag)
    for i, jpg in enumerate(jpeg_frames):
        index.append((b"00dc", len(jpg), 4 + movi.tell()))
        movi.write(_chunk(b"00dc", jpg))
        if spans and len(spans[i]):
            raw = spans[i].tobytes()
            index.append((b"01wb", len(raw), 4 + movi.tell()))
            movi.write(_chunk(b"01wb", raw))
    movi_bytes = movi.getvalue()

    max_v = max((len(j) for j in jpeg_frames), default=0)
    max_a = max((2 * len(s) for s in spans), default=0)
    n_streams = 2 if pcm is not None else 1
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(round(1_000_000 / fps)),
        int(len(movi_bytes) * fps / max(n, 1)),  # rough max bytes/s
        0, _AVIF_HASINDEX | _AVIF_ISINTERLEAVED,
        n, 0, n_streams, max(max_v, max_a), w, h,
        0, 0, 0, 0,
    )
    hdrl = _chunk(b"avih", avih) + _video_strl(w, h, fps, n, max_v)
    if pcm is not None:
        hdrl += _audio_strl(sample_rate, len(pcm), max_a)

    idx = b"".join(
        cc + struct.pack("<III", _AVIIF_KEYFRAME, off, sz)
        for cc, sz, off in index
    )

    body = (
        b"AVI "
        + _list(b"hdrl", hdrl)
        + _list(b"movi", movi_bytes)
        + _chunk(b"idx1", idx)
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return n
