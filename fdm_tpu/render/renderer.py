"""Host-side visualization: vertex sequences -> video.

Capability parity with the reference's render CLIs (reference
render/render.py:21-157, render_mead.py) re-based on in-image dependencies:
the reference needs pyrender + OSMesa + psbody.mesh + an ffmpeg binary; this
renderer is a numpy point-splat rasterizer (orthographic VOCA-style front
view, depth-shaded) written straight to mp4 via OpenCV, with optional ffmpeg
audio muxing when the binary exists. Rendering is offline tooling, not a TPU
workload (SURVEY.md §2.4), so staying host-side numpy is the idiomatic
choice.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Iterable, Optional, Tuple

import numpy as np


def project_orthographic(
    vertices: np.ndarray,               # (V, 3)
    size: int,
    bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    margin: float = 0.08,
) -> Tuple[np.ndarray, np.ndarray]:
    """Front-view orthographic projection to pixel coordinates.

    Returns ((V, 2) int pixel xy, (V,) depth in [0, 1]). `bounds` fixes the
    normalization box across frames so the head doesn't swim."""
    if bounds is None:
        lo, hi = vertices.min(axis=0), vertices.max(axis=0)
    else:
        lo, hi = bounds
    span = float((hi - lo).max()) or 1.0
    center = (lo + hi) / 2.0
    norm = (vertices - center) / span  # ~[-0.5, 0.5]
    scale = size * (1.0 - 2.0 * margin)
    x = (norm[:, 0] * scale + size / 2.0).astype(np.int32)
    # image y grows downward; mesh y grows upward
    y = (size / 2.0 - norm[:, 1] * scale).astype(np.int32)
    z = norm[:, 2] + 0.5
    xy = np.stack([np.clip(x, 0, size - 1), np.clip(y, 0, size - 1)], axis=1)
    return xy, np.clip(z, 0.0, 1.0)


def render_frame(
    vertices: np.ndarray,               # (V, 3)
    size: int = 800,
    bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    background: float = 0.0,
) -> np.ndarray:
    """One (size, size, 3) uint8 frame: depth-shaded point splat with a
    3x3 dilation so dense meshes read as a surface."""
    xy, z = project_orthographic(vertices, size, bounds)
    depth = np.full((size, size), -np.inf, dtype=np.float32)
    # z-buffer: keep the nearest (max z) point per pixel
    np.maximum.at(depth, (xy[:, 1], xy[:, 0]), z.astype(np.float32))
    img = np.where(np.isfinite(depth), 0.25 + 0.75 * depth, background)
    # dilate to close gaps between splatted points
    try:
        import cv2

        img = cv2.dilate(img, np.ones((3, 3), np.float32))
        img = cv2.GaussianBlur(img, (3, 3), 0)
    except ImportError:
        pass
    gray = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    return np.stack([gray, gray, gray], axis=-1)


def render_mesh_frame(
    vertices: np.ndarray,               # (V, 3)
    faces: np.ndarray,                  # (F, 3) int
    size: int = 800,
    bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> np.ndarray:
    """Flat-shaded triangle rasterization (painter's algorithm + Lambertian
    shading from a fixed front light) — the closest in-image equivalent of
    the original's pyrender offscreen pass."""
    import cv2

    xy, z = project_orthographic(vertices, size, bounds)
    tri_z = z[faces].mean(axis=1)
    order = np.argsort(tri_z)  # far to near

    v = np.asarray(vertices, np.float32)
    e1 = v[faces[:, 1]] - v[faces[:, 0]]
    e2 = v[faces[:, 2]] - v[faces[:, 0]]
    normals = np.cross(e1, e2)
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.maximum(norm, 1e-12)
    # light from the camera (+z); two-sided shading
    shade = 0.15 + 0.85 * np.abs(normals[:, 2])

    img = np.zeros((size, size), np.float32)
    pts = xy[faces]  # (F, 3, 2)
    for i in order:
        cv2.fillConvexPoly(
            img, pts[i].astype(np.int32), float(shade[i]),
            lineType=cv2.LINE_8,
        )
    gray = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    return np.stack([gray, gray, gray], axis=-1)


def render_sequence(
    vertices: np.ndarray,               # (T, V, 3) or (T, V*3)
    size: int = 800,
    faces: Optional[np.ndarray] = None,
    rig: str = "voca",
    dataset: str = "vocaset",
    z_offset: float = 0.0,
    background_black: bool = False,
    rot: Optional[np.ndarray] = None,   # axis-angle pre-rotation about the
                                        # first frame's centroid
                                        # (reference render.py:41,128)
    shading: str = "fragment",          # voca rig: per-fragment PBR or
                                        # "gouraud" (cheaper)
) -> Iterable[np.ndarray]:
    """Yield one frame per timestep.

    rig="voca" (default, needs `faces`): the reference's pyrender scene —
    perspective VOCA camera, raymond lighting, per-fragment glTF-PBR
    shading (fdm_tpu.render.voca_rig). rig="ortho": the fast fallback — flat-shaded
    painter's-algorithm meshes with `faces`, depth-shaded point splats
    without (sequence-constant normalization)."""
    verts = np.asarray(vertices, np.float32)
    if verts.ndim == 2:
        verts = verts.reshape(verts.shape[0], -1, 3)
    if rig == "voca" and faces is not None:
        from fdm_tpu.render.voca_rig import render_frame_voca

        t_center = verts[0].mean(axis=0)  # reference render.py:128
        for t in range(verts.shape[0]):
            yield render_frame_voca(
                verts[t], faces, dataset=dataset, size=size,
                rot=rot, t_center=t_center, z_offset=z_offset,
                background_black=background_black, shading=shading,
            )
        return
    lo = verts.reshape(-1, 3).min(axis=0)
    hi = verts.reshape(-1, 3).max(axis=0)
    for t in range(verts.shape[0]):
        if faces is not None:
            yield render_mesh_frame(verts[t], faces, size, bounds=(lo, hi))
        else:
            yield render_frame(verts[t], size, bounds=(lo, hi))


def write_video(
    frames: Iterable[np.ndarray],
    path: str,
    fps: int = 25,
    audio_path: Optional[str] = None,
) -> int:
    """Write frames to an .mp4 (cv2 VideoWriter); mux audio with ffmpeg when
    the binary is available (the reference shells out to ffmpeg for both
    encode and mux, render/render.py:146-153). Without ffmpeg the audio is
    NOT dropped: a sibling .avi (hand-written MJPEG + PCM container,
    render/avi.py) carries the muxed result. Returns the frame count."""
    import cv2

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    # no ffmpeg -> the mp4 cannot carry audio; collect per-frame JPEGs in
    # the same pass so the AVI fallback never re-renders
    need_avi = bool(audio_path) and not shutil.which("ffmpeg")
    from fdm_tpu.render import avi as _avi

    writer = None
    count = 0
    jpegs = []
    size = None
    for frame in frames:
        if writer is None:
            h, w = frame.shape[:2]
            size = (w, h)
            writer = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
            )
            if not writer.isOpened():
                # e.g. an OpenCV build without the mp4v encoder: without
                # this check every write() is a silent no-op and the CLI
                # would report success with no file produced
                raise RuntimeError(
                    f"cv2.VideoWriter could not open {path!r} (mp4v) — "
                    f"missing codec or unwritable path"
                )
        writer.write(frame[..., ::-1])  # RGB -> BGR
        if need_avi:
            jpegs.extend(_avi.encode_jpeg_frames([frame]))
        count += 1
    if writer is not None:
        writer.release()

    if audio_path and shutil.which("ffmpeg"):
        muxed = path + ".muxed.mp4"
        result = subprocess.run(
            ["ffmpeg", "-y", "-i", path, "-i", audio_path, "-c:v", "copy",
             "-c:a", "aac", "-shortest", muxed],
            capture_output=True,
        )
        if result.returncode == 0:
            os.replace(muxed, path)
        else:
            # surface the failure instead of silently shipping a silent
            # video, and don't leave the partial temp file behind
            stderr = (result.stderr or b"").decode(errors="replace")[-500:]
            print(
                f"ffmpeg mux failed (rc={result.returncode}); wrote "
                f"silent video. ffmpeg said:\n{stderr}"
            )
            try:
                os.remove(muxed)
            except OSError:
                pass
    elif need_avi and count:
        wav = _load_wav_mono(audio_path)
        if wav is None:
            print(f"could not decode {audio_path}; wrote silent video")
        else:
            samples, sr = wav
            avi_path = os.path.splitext(path)[0] + ".avi"
            _avi.write_avi_mjpeg(
                avi_path, jpegs, fps, size, audio=samples, sample_rate=sr
            )
            print(f"ffmpeg not found; wrote audio-muxed MJPEG AVI {avi_path}")
    return count


def _load_wav_mono(path: str):
    """(float32 mono samples, sample_rate) via the native PCM16 decoder,
    falling back to scipy; None when neither can read it."""
    try:
        from fdm_tpu.data.native import read_wav_pcm16

        out = read_wav_pcm16(path)
        if out is not None:
            return out
    except Exception:
        pass
    try:
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        data = np.asarray(data)
        if data.ndim > 1:
            data = data.mean(axis=1)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        return data, int(sr)
    except Exception:
        return None
