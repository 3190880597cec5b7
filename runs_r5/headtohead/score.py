"""Score both head-to-head sides against the same ground truth with the
same metrics: correlation delta (matched vs mismatched audio, the learning
evidence) and FVE/LVE/EME over the reference's own region-vertex-id files
(reference metric/metric.py:49-56,115-138).

Run after ref_train.py and tpu_side.sh finish (CPU):
    PYTHONPATH=/root/repo python runs_r5/headtohead/score.py
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import h2h_config as H

REF_METRIC_DIR = "/root/reference/metric"


def load_preds(pred_dir, records):
    preds = {}
    for rec in records:
        path = os.path.join(pred_dir, rec.name + ".npy")
        arr = np.load(path)
        if arr.ndim == 3:  # torch side saves (T, V, 3)-less (T, D); guard
            arr = arr.reshape(arr.shape[0], -1)
        preds[rec.name] = arr[: rec.num_frames]  # trim the reference's
        # audio-length overhang (sample length = hidden//2 > T)
    return preds


def main():
    import argparse

    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu_preds", default=os.path.join(H.TPU_DIR, "preds"))
    ap.add_argument("--json_out", default=os.path.join(HERE,
                                                       "headtohead.json"))
    ap.add_argument("--ref_json", default=None,
                    help="reuse the reference-side metrics from a prior "
                    "run's JSON instead of rescoring its preds (the data "
                    "universe is deterministic — seed %d — so the v1 "
                    "reference numbers remain valid when its on-disk preds "
                    "are gone)" % H.SEED)
    cli = ap.parse_args()

    from fdm_tpu.cli.common import FlameDecoder
    from fdm_tpu.data import synthetic_splits
    from fdm_tpu.eval.correlation import correlation_report
    from fdm_tpu.eval.metrics import MetricAccumulator

    cfg = H.build_tpu_config()
    records = synthetic_splits(
        cfg, num_train=H.SIZE, num_eval=max(2, H.SIZE // 8),
        min_frames=40, max_frames=120, seed=H.SEED, with_audio=True,
        mode="correlated",
    ).test

    flame = FlameDecoder(cfg, None, device=jax.devices("cpu")[0])
    bucket = max(((max(r.num_frames for r in records) + 63) // 64) * 64, 64)

    def decode(params):
        T = params.shape[0]
        padded = np.zeros((bucket, params.shape[1]), np.float32)
        padded[:T] = params
        return np.asarray(flame(padded[None])[0][:T])

    template = np.load(os.path.join(H.DATA_DIR, "template.npy"))  # (1, D)
    gt = {
        r.name: np.load(os.path.join(H.DATA_DIR, r.name + ".npz"))["vertices"]
        for r in records
    }
    regions = {
        "face": np.load(os.path.join(REF_METRIC_DIR, "face_vertices.npy")),
        "lip": np.load(os.path.join(REF_METRIC_DIR, "lip_vertices.npy")),
        "emotion": np.load(
            os.path.join(REF_METRIC_DIR, "emotion_vertices.npy")),
    }

    out = {"config": {
        "size": H.SIZE, "seed": H.SEED,
        "stage1_epochs": H.STAGE1_EPOCHS, "stage2_epochs": H.STAGE2_EPOCHS,
        "vq": H.VQ, "fdm": H.FDM, "audio_layers": H.AUDIO_LAYERS,
        "sampler": "ddpm1000",
    }}
    for side, pred_dir in (("reference", os.path.join(H.REF_DIR, "preds")),
                           ("fdm_tpu", cli.tpu_preds)):
        if side == "reference" and cli.ref_json:
            with open(cli.ref_json) as f:
                out["reference"] = json.load(f)["reference"]
            out["reference_source"] = cli.ref_json
            continue
        preds = load_preds(pred_dir, records)
        rep = correlation_report(
            records, None, config=cfg, decode=decode, recompute_gt=True,
            preds=preds,
        )
        acc = MetricAccumulator(regions, fdd_region="emotion")
        for rec in records:
            acc.update(gt[rec.name], preds[rec.name], template=template)
        res = acc.result()
        out[side] = {
            "matched_corr_mean": rep["matched_corr_mean"],
            "mismatched_corr_mean": rep["mismatched_corr_mean"],
            "delta": rep["delta"],
            "fve": res["fve"], "lve": res["lve"], "eme": res["eme"],
            "mve": res["mve"], "fdd": res.get("fdd"),
        }

    r, t = out["reference"], out["fdm_tpu"]
    rows = [("metric", "reference(torch)", "fdm_tpu", "fdm_tpu/ref")]
    for key in ("delta", "matched_corr_mean", "fve", "lve", "eme", "mve"):
        ratio = t[key] / r[key] if r[key] else float("nan")
        rows.append((key, f"{r[key]:+.5f}", f"{t[key]:+.5f}", f"{ratio:.3f}"))
    widths = [max(len(row[i]) for row in rows) for i in range(4)]
    lines = ["| " + " | ".join(c.ljust(w) for c, w in zip(row, widths)) + " |"
             for row in rows]
    lines.insert(1, "|" + "|".join("-" * (w + 2) for w in widths) + "|")
    table = "\n".join(lines)
    print(table)

    out["table"] = table
    path = cli.json_out
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
