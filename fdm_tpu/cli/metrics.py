"""Metric CLI: FVE/LVE/EME (MEAD) or MVE/LVE/FDD (BIWI/VOCASET) + Diversity
over directories of saved .npy vertex sequences.

Parity surface: reference metric/metric.py (region .npy index files, FLAME
mesh) and computer_metrix.py (mouth/upper region files, templates.pkl,
identity-conditioned diversity). Predictions and ground truth pair by file
name: pred_dir/<name>.npy vs gt_dir/<name>.npy; files named
<name>_condition_<i>.npy group into diversity sets per <name>.

  python -m fdm_tpu.cli.metrics --pred_path results/diffusion \
      --gt_path data/vertices_npy --mouth_region regions/lve.txt \
      --upper_region regions/fdd.txt --templates data/templates.pkl
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import re
from collections import defaultdict

import numpy as np

from fdm_tpu.eval import MetricAccumulator, diversity

_CONDITION_RE = re.compile(r"^(?P<stem>.+)_condition_(?P<cond>.+)$")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pred_path", required=True)
    parser.add_argument("--gt_path", default=None,
                        help="ground-truth dir (omit for diversity-only)")
    parser.add_argument("--face_region", default=None,
                        help="face vertex ids (.npy/.txt) -> FVE")
    parser.add_argument("--lip_region", default=None,
                        help="lip/mouth vertex ids -> LVE")
    parser.add_argument("--emotion_region", default=None,
                        help="emotion vertex ids -> EME (mean-reduced)")
    parser.add_argument("--upper_region", default=None,
                        help="upper-face vertex ids -> FDD")
    parser.add_argument("--lip_threshold", type=float, default=0.1,
                        help="weight cutoff for weighted lip-mask files")
    parser.add_argument("--upper_threshold", type=float, default=0.4,
                        help="weight cutoff for weighted forehead-mask files")
    parser.add_argument("--templates", default=None,
                        help="templates.pkl (per-subject) or template .npy; "
                             "needed for FDD")
    parser.add_argument("--gt_is_flame_params", action="store_true",
                        help="ground-truth .npy files are MEAD (T, 56) FLAME "
                             "params; decode them to vertices first (the "
                             "original decodes GT through FLAME on the fly)")
    parser.add_argument("--flame_model", default=None,
                        help="FLAME generic_model.pkl for GT decoding "
                             "(synthetic stand-in if unset)")
    parser.add_argument("--json", dest="as_json", action="store_true",
                        help="print one JSON object instead of lines")
    return parser


def _load_region(path: str, weight_threshold: float = 0.0) -> np.ndarray:
    """Vertex-id region file in any of the reference formats:
      * .npy index array (MEAD: face/lip/emotion_vertices.npy)
      * comma- or whitespace-separated ints (BIWI regions/lve.txt, fdd.txt —
        reference computer_metrix.py:27-33)
      * one weight per line -> ids where weight > threshold (multiface
        weighted_mouth_mask.txt at 0.1, forehead_mask.txt at 0.4 —
        reference computer_metrix.py:42-55)."""
    if path.endswith(".npy"):
        ids = np.load(path).astype(np.int64).reshape(-1)
    else:
        text = open(path).read().replace(",", " ")
        values = np.asarray(
            [float(v) for v in text.split()], dtype=np.float64
        )
        if values.size == 0:
            raise SystemExit(f"region file {path!r} is empty")
        if np.all(values == np.round(values)) and (
            values.max() > 1 or weight_threshold == 0.0
        ):
            ids = values.astype(np.int64)
        else:
            ids = np.nonzero(values > weight_threshold)[0].astype(np.int64)
    if ids.size == 0:
        raise SystemExit(
            f"region file {path!r} selects zero vertices (weight "
            f"threshold {weight_threshold})"
        )
    return ids


def _load_templates(path: str):
    if path is None:
        return None
    if path.endswith(".npy"):
        arr = np.load(path).astype(np.float32).reshape(-1)
        return lambda name: arr
    with open(path, "rb") as f:
        table = pickle.load(f, encoding="latin1")

    def lookup(name: str):
        for key, value in table.items():
            if name.startswith(str(key)):
                return np.asarray(value, np.float32).reshape(-1)
        return None

    return lookup


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    thresholds = {"lip": args.lip_threshold, "upper": args.upper_threshold}
    regions = {}
    for arg_name, region_name in (
        ("face_region", "face"), ("lip_region", "lip"),
        ("emotion_region", "emotion"), ("upper_region", "upper"),
    ):
        path = getattr(args, arg_name)
        if path:
            regions[region_name] = _load_region(
                path, thresholds.get(region_name, 0.0)
            )
    templates = _load_templates(args.templates)
    fdd_region = "upper" if "upper" in regions else (
        "emotion" if "emotion" in regions else None
    )

    pred_files = sorted(
        f for f in os.listdir(args.pred_path) if f.endswith(".npy")
    )
    if not pred_files:
        raise SystemExit(f"no .npy files in {args.pred_path}")

    # group conditioned predictions for diversity
    groups = defaultdict(list)
    for fname in pred_files:
        stem = fname[:-4]
        m = _CONDITION_RE.match(stem)
        groups[m.group("stem") if m else stem].append(fname)

    flame_decode = None
    if args.gt_is_flame_params:
        import jax

        from fdm_tpu.cli.common import FlameDecoder, build_config

        class _Args:
            dataset, tiny, overrides, data_root, synthetic, seed = (
                "mead", False, [], None, True, 0,
            )

        decoder = FlameDecoder(build_config(_Args()), args.flame_model)

        def flame_decode(params):  # (T, P) -> (T, V*3)
            import jax.numpy as jnp

            return np.asarray(decoder(jnp.asarray(params)[None]))[0]

    results = {}
    div_by_stem = {}
    if args.gt_path:
        acc = MetricAccumulator(regions, fdd_region=fdd_region)
        matched = 0
        for stem, fnames in sorted(groups.items()):
            gt_file = os.path.join(args.gt_path, stem + ".npy")
            if not os.path.exists(gt_file):
                continue
            gt = np.load(gt_file).astype(np.float32)
            if flame_decode is not None:
                gt = flame_decode(gt)
            gt = gt.reshape(gt.shape[0], -1, 3)
            template = templates(stem) if templates else None
            if template is None and fdd_region is not None:
                # FDD measures motion-std relative to the neutral template;
                # a fabricated zero template gives a wrong-but-plausible
                # number — skip the metric and say so instead
                print(
                    f"note: no template for {stem!r}; FDD skipped for it "
                    f"(pass --templates for FDD)"
                )
            group_preds = []
            for fname in fnames:
                pred = np.load(os.path.join(args.pred_path, fname))
                pred = pred.astype(np.float32).reshape(pred.shape[0], -1, 3)
                acc.update(gt, pred, template)
                matched += 1
                # diversity is computed per group right here, so host
                # memory stays bounded to ONE group's predictions (an
                # --all_conditions eval would otherwise hold the entire
                # prediction set until exit)
                if len(fnames) >= 2:
                    group_preds.append(pred)
            if len(group_preds) >= 2:
                div_by_stem[stem] = diversity(group_preds)
        if matched == 0:
            raise SystemExit("no prediction/ground-truth name matches")
        results.update(acc.result())

    div_terms = []
    for stem, fnames in sorted(groups.items()):
        if len(fnames) < 2:
            continue
        if stem in div_by_stem:  # computed during the GT pass
            div_terms.append(div_by_stem[stem])
            continue
        preds = [
            np.load(os.path.join(args.pred_path, f)).astype(np.float32)
            for f in fnames
        ]
        div_terms.append(diversity(preds))
    if div_terms:
        results["diversity"] = float(np.mean(div_terms))

    if args.as_json:
        print(json.dumps(results))
    else:
        label = {"fve": "Face Vertex Error (FVE)",
                 "lve": "Lip Vertex Error (LVE)",
                 "eme": "Emotion Mean Error (EME)",
                 "ave": "All Vertex Error",
                 "mve": "Mean Vertex Error (MVE)",
                 "fdd": "FDD", "abs_fdd": "ABS FDD",
                 "diversity": "Diversity"}
        for key, value in results.items():
            if key in label:
                print(f"{label[key]}: {value:.4e}")
            else:
                print(f"{key}: {value:g}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
