"""Render CLI: saved .npy vertex sequences -> .mp4 (optionally with audio).

Parity surface: reference render/render.py and render_mead.py (pyrender
offscreen + cv2.VideoWriter + ffmpeg mux) using the in-image software
renderer (fdm_tpu.render).

  python -m fdm_tpu.cli.render --pred_path results/diffusion --fps 30 \
      --audio_dir data/wav --output_dir videos
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from fdm_tpu.render import render_sequence, write_video


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pred_path", required=True,
                        help="one .npy file or a directory of them")
    parser.add_argument("--output_dir", default="videos")
    parser.add_argument("--fps", type=int, default=25,
                        help="MEAD 24 / BIWI 25 / VOCASET 30")
    parser.add_argument("--size", type=int, default=800)
    parser.add_argument("--audio_dir", default=None,
                        help="dir of <name>.wav files to mux (via ffmpeg "
                             "when available, else a hand-written MJPEG+PCM "
                             ".avi — no external binary needed)")
    parser.add_argument("--faces", default=None,
                        help=".npy (F, 3) triangle indices -> mesh "
                             "rendering instead of point splats")
    parser.add_argument("--rig", default="voca", choices=["voca", "ortho"],
                        help="voca = reference perspective camera + raymond "
                             "lighting + per-fragment PBR shading (needs "
                             "--faces); "
                             "ortho = fast orthographic fallback")
    parser.add_argument("--shading", default="fragment",
                        choices=["fragment", "gouraud"],
                        help="voca rig: per-fragment glTF-PBR (pyrender's "
                             "pipeline, default) or per-vertex Gouraud "
                             "(cheaper)")
    parser.add_argument("--camera", default="vocaset",
                        choices=["vocaset", "biwi", "mead"],
                        help="intrinsics preset (reference render.py:30-37)")
    parser.add_argument("--z_offset", type=float, default=0.0,
                        help="camera z shift (reference render.py:71)")
    parser.add_argument("--background_black", action="store_true",
                        help="black background (reference render.py:57-60)")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.fps <= 0:
        raise SystemExit(f"--fps must be positive, got {args.fps}")
    if args.size <= 0:
        raise SystemExit(f"--size must be positive, got {args.size}")
    if os.path.isdir(args.pred_path):
        files = sorted(
            os.path.join(args.pred_path, f)
            for f in os.listdir(args.pred_path) if f.endswith(".npy")
        )
    else:
        files = [args.pred_path]
    if not files:
        raise SystemExit(f"no .npy files at {args.pred_path}")

    faces = np.load(args.faces).astype(np.int64) if args.faces else None
    os.makedirs(args.output_dir, exist_ok=True)
    for path in files:
        name = os.path.splitext(os.path.basename(path))[0]
        verts = np.load(path)
        audio = None
        if args.audio_dir:
            stem = name.split("_condition_")[0]
            cand = os.path.join(args.audio_dir, stem + ".wav")
            audio = cand if os.path.exists(cand) else None
        out = os.path.join(args.output_dir, name + ".mp4")
        n = write_video(
            render_sequence(
                verts, size=args.size, faces=faces, rig=args.rig,
                dataset=args.camera, z_offset=args.z_offset,
                background_black=args.background_black,
                shading=args.shading,
            ),
            out, fps=args.fps, audio_path=audio,
        )
        print(f"{out}: {n} frames @ {args.fps} fps")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
