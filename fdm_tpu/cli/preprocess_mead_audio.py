"""MEAD audio preprocessing: decode the dataset's .m4a clips to the 16 kHz
mono .wav layout the loaders read.

Parity surface: the reference decodes MEAD m4a on the fly through librosa's
ffmpeg-backed audioread path (reference datasets/data_loader_mead.py audio
read); neither librosa nor an ffmpeg binary ships in every environment, so
here the decode is an explicit one-time preprocessing step:

  python -m fdm_tpu preprocess-mead-audio --src <MEAD_root>/AUDIO \
      --dst <MEAD_root>/AUDIO

With --dst equal to --src the 16 kHz wav lands NEXT TO each source clip —
exactly where the MEAD loader looks for it (fdm_tpu/data/mead.py reads
`<audio_path minus extension>.wav`). A separate --dst mirrors the tree for
archival use but the loader will not find it there.

Sources already in .wav are resampled in-process (scipy polyphase, no
external binary). Compressed .m4a/.mp4/.aac need a decoder: ffmpeg when on
PATH, or any command template via --converter
(e.g. --converter 'avconv -i {src} -ar {sr} -ac 1 {dst}'). Outputs are
written to a temp name and renamed on success, so an interrupted run never
leaves a truncated wav that a re-run would skip as complete.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
from typing import List, Optional, Tuple

import numpy as np

COMPRESSED = (".m4a", ".mp4", ".aac")
TARGET_SR = 16000


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--src", required=True,
                        help="directory tree containing .m4a/.wav audio")
    parser.add_argument("--dst", required=True,
                        help="output directory for 16 kHz mono .wav files")
    parser.add_argument("--sr", type=int, default=TARGET_SR)
    parser.add_argument("--flatten", action="store_true",
                        help="write all wavs into --dst directly (default "
                             "mirrors the source tree)")
    parser.add_argument(
        "--converter", default=None,
        help="command template for compressed sources with {src} {dst} {sr} "
             "placeholders; default uses ffmpeg when available",
    )
    return parser


def find_audio(src: str) -> List[str]:
    hits = []
    for root, _dirs, files in os.walk(src):
        # wav sorts before any compressed sibling with the same stem: in an
        # in-place run the wav must claim the output slot FIRST so its
        # sample rate gets checked/resampled — if the m4a claimed it, the
        # pre-existing (possibly 44.1 kHz) wav would be skipped by the
        # dedup before its rate check ever ran
        for f in sorted(
            files,
            key=lambda f: (os.path.splitext(f)[0],
                           not f.lower().endswith(".wav"), f),
        ):
            if f.lower().endswith(".converting.wav"):
                continue  # temp file from a hard-killed earlier run
            if f.lower().endswith(COMPRESSED + (".wav",)):
                hits.append(os.path.join(root, f))
    return hits


def resample_wav(path: str, dst: str, sr: int) -> None:
    """In-process wav -> 16 kHz mono wav. Decode/mono/resample is
    data.common.read_wav (one copy of the PCM-normalization logic);
    normalization is off because the preprocessor writes files the loaders
    will normalize at read time."""
    from scipy.io import wavfile

    from fdm_tpu.data.common import read_wav

    data = read_wav(path, target_sr=sr, normalize=False)
    wavfile.write(dst, sr, np.clip(data, -1.0, 1.0))


def default_converter() -> Optional[str]:
    if shutil.which("ffmpeg"):
        return "ffmpeg -y -i {src} -ar {sr} -ac 1 {dst}"
    return None


def convert_compressed(path: str, dst: str, sr: int,
                       converter: Optional[str]) -> None:
    template = converter or default_converter()
    if template is None:
        raise SystemExit(
            f"cannot decode {path!r}: compressed MEAD audio needs a decoder "
            f"and neither ffmpeg is on PATH nor --converter was given. "
            f"Run the conversion once on any machine with ffmpeg:\n"
            f"  ffmpeg -i <clip>.m4a -ar {sr} -ac 1 <clip>.wav\n"
            f"or pass --converter 'your-tool -i {{src}} ... {{dst}}'."
        )
    cmd = [
        part.format(src=path, dst=dst, sr=sr)
        for part in template.split()
    ]
    res = subprocess.run(cmd, capture_output=True)
    if res.returncode != 0 or not os.path.exists(dst):
        raise SystemExit(
            f"converter failed on {path!r} (rc={res.returncode}): "
            f"{res.stderr.decode(errors='replace')[-500:]}"
        )


def process(src: str, dst: str, sr: int, flatten: bool,
            converter: Optional[str]) -> Tuple[int, int]:
    files = find_audio(src)
    if not files:
        raise SystemExit(f"no .wav/.m4a audio under {src!r}")
    done = skipped = 0
    seen = {}
    for path in files:
        rel = os.path.relpath(path, src)
        out_rel = (
            os.path.basename(rel) if flatten else rel
        )
        out = os.path.join(
            dst, os.path.splitext(out_rel)[0] + ".wav"
        )
        if out in seen:
            if flatten:
                # MEAD reuses clip basenames across speakers/emotions/
                # levels; silently skipping the collision would drop clips
                raise SystemExit(
                    f"--flatten collision: {path!r} and {seen[out]!r} both "
                    f"map to {out!r}; drop --flatten to mirror the source "
                    f"tree"
                )
            # mirrored layout: a sibling .wav/.m4a pair with one stem (e.g.
            # an in-place re-run after conversion) — the first claim stands
            skipped += 1
            continue
        seen[out] = path
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        if os.path.abspath(out) == os.path.abspath(path):
            # in-place run over a source wav: skip if already at target
            # rate, else resample over it (tmp + rename keeps it atomic).
            # mmap avoids decoding the whole file just to read the header
            # (a full-tree re-run reads every sample otherwise)
            from scipy.io import wavfile

            try:
                in_sr, _ = wavfile.read(path, mmap=True)
            except ValueError:
                # mmap rejects 3-byte (24-bit) PCM containers; fall back to
                # a full decode for those rather than failing the tree
                in_sr, _ = wavfile.read(path)
            if in_sr == sr:
                skipped += 1
                continue
        elif os.path.exists(out):
            skipped += 1
            continue
        # temp name + atomic rename: a killed/failed conversion must not
        # leave a truncated file the next run would count as done
        tmp = os.path.splitext(out)[0] + ".converting.wav"
        try:
            if path.lower().endswith(".wav"):
                resample_wav(path, tmp, sr)
            else:
                convert_compressed(path, tmp, sr, converter)
            os.replace(tmp, out)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        done += 1
    return done, skipped


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    done, skipped = process(
        args.src, args.dst, args.sr, args.flatten, args.converter
    )
    print(
        f"preprocess-mead-audio: wrote {done} wav(s) to {args.dst} "
        f"({skipped} already present)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
