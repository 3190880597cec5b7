"""VOCASET preprocessing CLI: unpack the raw distribution
(data_verts.npy + raw_audio_fixed.pkl + subj_seq_to_idx.pkl) into the
per-sequence layout the loaders consume (vertices_npy/<sub>_<seq>.npy and
wav/<sub>_<seq>.wav).

Parity surface: reference vocaset/process_voca_data.py:15-33. Vectorized:
frames of one sequence are gathered with a single fancy index into the
memory-mapped vertex array instead of a per-frame Python append loop.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--verts_path", default="data_verts.npy")
    parser.add_argument("--raw_audio_path", default="raw_audio_fixed.pkl")
    parser.add_argument("--data2array_verts_path", default="subj_seq_to_idx.pkl")
    parser.add_argument("--vertices_npy_path", default="vertices_npy")
    parser.add_argument("--wav_path", default="wav")
    parser.add_argument("--vertices_dim", type=int, default=5023 * 3)
    return parser


def write_vertices(verts_path: str, index_path: str, out_dir: str,
                   vertices_dim: int) -> int:
    face_verts = np.load(verts_path, mmap_mode="r")
    with open(index_path, "rb") as f:
        data2array = pickle.load(f)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for sub, seqs in data2array.items():
        for seq, frame_map in seqs.items():
            # frame -> row index; order by frame number
            idx = np.asarray(
                [frame_map[k] for k in sorted(frame_map)], dtype=np.int64
            )
            arr = np.asarray(face_verts[idx]).reshape(-1, vertices_dim)
            np.save(os.path.join(out_dir, f"{sub}_{seq}.npy"), arr)
            n += 1
    return n


def write_wavs(raw_audio_path: str, out_dir: str) -> int:
    from scipy.io import wavfile

    with open(raw_audio_path, "rb") as f:
        raw_audio = pickle.load(f, encoding="latin1")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for sub, seqs in raw_audio.items():
        for seq, payload in seqs.items():
            wavfile.write(
                os.path.join(out_dir, f"{sub}_{seq}.wav"),
                payload["sample_rate"], payload["audio"],
            )
            n += 1
    return n


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    nv = write_vertices(
        args.verts_path, args.data2array_verts_path,
        args.vertices_npy_path, args.vertices_dim,
    )
    print(f"wrote {nv} vertex sequences to {args.vertices_npy_path}")
    nw = write_wavs(args.raw_audio_path, args.wav_path)
    print(f"wrote {nw} wav files to {args.wav_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
