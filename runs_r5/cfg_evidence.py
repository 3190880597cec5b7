"""At-scale classifier-free-guidance evidence (VERDICT r3 item 5 /
BASELINE config #4) on the round-4 MEAD correlated-rehearsal model.

Round 3's CFG artifact was bit-identical to the unguided one (the
collapsed codec absorbed the guidance delta entirely — VERDICT r3 weak
#2). This analyzer compares a cfg=0 sample directory against a cfg=2.5
directory from the SAME trained model and seed and reports:

 1. per-clip max|Δ| between the two arms — the post-quantization
    "CFG changes the output" claim; hard-fails if any clip is identical;
 2. matched-vs-mismatched temporal correlation for both arms
    (fdm_tpu.eval.correlation — the round-4 learning-evidence metric);
 3. EME (mean squared vertex error over an emotion-sensitive region,
    reference metric/metric.py:115-138 semantics via
    fdm_tpu.eval.metrics.region_vertex_error) for both arms. The region
    is derived from the synthetic task itself: the vertices the
    emotion component of the articulation map actually displaces,
    decoded through FLAME — the synthetic analog of the reference's
    hand-authored emotion-region .npy file. Guidance strengthens
    conditioning adherence, so EME(cfg2.5) <= EME(cfg0) is expected.
"""

import argparse
import json
import os
import sys

# self-locate the repo root: ADVICE r3 item 1 — python puts the script's
# OWN directory on sys.path, so a runs/ script loses `import fdm_tpu`
# whenever the caller forgets PYTHONPATH
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # score on CPU: the chip is
# training the family rehearsals while this analyzer runs

import numpy as np  # noqa: E402

from fdm_tpu.cli.common import (  # noqa: E402
    FlameDecoder,
    add_common_args,
    build_config,
    load_splits,
)
from fdm_tpu.data.synthetic import (  # noqa: E402
    envelope_to_motion,
    frame_rms_envelope,
)
from fdm_tpu.eval.correlation import correlation_report  # noqa: E402
from fdm_tpu.eval.metrics import region_vertex_error  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--cfg0_dir", required=True)
    ap.add_argument("--cfg25_dir", required=True)
    ap.add_argument("--json_out", required=True)
    ap.add_argument("--flame_model", default=None)
    ap.add_argument("--region_frac", type=float, default=0.05,
                    help="fraction of vertices in the emotion region")
    ap.add_argument("--max_clips", type=int, default=None,
                    help="score only the first N test clips (must cover "
                         "at least the clips the sample dirs hold)")
    args = ap.parse_args()

    cfg = build_config(args)
    splits = load_splits(cfg, args, read_audio=True)
    records = splits["test"]
    if args.max_clips:
        records = records[: args.max_clips]
    if not records:
        raise SystemExit("empty test split")

    flame = FlameDecoder(cfg, args.flame_model)

    def decode(params: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(flame(jnp.asarray(params[None]))[0])

    # ---- 1. the two arms differ post-quantization ----
    diffs = {}
    for rec in records:
        a = np.load(os.path.join(args.cfg0_dir, rec.name + ".npy"))
        b = np.load(os.path.join(args.cfg25_dir, rec.name + ".npy"))
        diffs[rec.name] = float(np.abs(
            a.astype(np.float64) - b.astype(np.float64)
        ).max())
    identical = sorted(n for n, d in diffs.items() if d == 0.0)

    # ---- 2. correlation, both arms ----
    corr = {
        arm: correlation_report(
            records, path, config=cfg, decode=decode, recompute_gt=True,
        )
        for arm, path in (("cfg0", args.cfg0_dir),
                          ("cfg25", args.cfg25_dir))
    }

    # ---- 3. EME over the emotion-sensitive vertex region ----
    # the emotion offset alone, in FLAME-param space: env == 0 zeroes the
    # primary and velocity terms of the articulation map
    zero_env = np.zeros(2, np.float32)
    style0 = np.eye(cfg.dataset.style_classes, dtype=np.float32)[0]
    base = decode(envelope_to_motion(zero_env, style0, None, cfg))
    disp = np.zeros(base[0].reshape(-1, 3).shape[0])
    n_emo = cfg.dataset.emotion_classes
    for e in range(n_emo):
        emo = np.eye(n_emo, dtype=np.float32)[e]
        verts = decode(envelope_to_motion(zero_env, style0, emo, cfg))
        d = (verts[0].reshape(-1, 3) - base[0].reshape(-1, 3))
        disp += np.linalg.norm(d, axis=1)
    k = max(16, int(len(disp) * args.region_frac))
    region = np.sort(np.argsort(disp)[::-1][:k])

    ds = cfg.dataset
    eme = {}
    for arm, path in (("cfg0", args.cfg0_dir), ("cfg25", args.cfg25_dir)):
        per_clip = []
        for rec in records:
            env = frame_rms_envelope(
                rec.audio, len(rec.motion), ds.fps, ds.audio_sr
            )
            gt = decode(envelope_to_motion(
                env, rec.style_one_hot, rec.emotion_one_hot, cfg
            ))
            pred = np.load(os.path.join(path, rec.name + ".npy"))
            per_clip.append(float(
                region_vertex_error(gt, pred, region, reduce="mean").mean()
            ))
        eme[arm] = float(np.mean(per_clip))

    report = {
        "clips": len(records),
        "identical_clips": identical,
        "max_abs_diff_min": min(diffs.values()),
        "max_abs_diff_max": max(diffs.values()),
        "per_clip_max_abs_diff": diffs,
        "corr_cfg0": {k: corr["cfg0"][k] for k in
                      ("matched_corr_mean", "mismatched_corr_mean", "delta")},
        "corr_cfg25": {k: corr["cfg25"][k] for k in
                       ("matched_corr_mean", "mismatched_corr_mean",
                        "delta")},
        "emotion_region_size": int(len(region)),
        "eme_cfg0": eme["cfg0"],
        "eme_cfg25": eme["cfg25"],
        "eme_improved": eme["cfg25"] <= eme["cfg0"],
    }
    with open(args.json_out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "per_clip_max_abs_diff"}, indent=1))
    print(f"wrote {args.json_out}")

    if identical:
        print(f"FAIL: {len(identical)} clip(s) bit-identical across "
              f"cfg 0/2.5: {identical[:4]}")
        return 1
    print("PASS: every clip differs post-quantization; "
          f"EME cfg2.5 {eme['cfg25']:.3e} vs cfg0 {eme['cfg0']:.3e} "
          f"({'improved' if report['eme_improved'] else 'NOT improved'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
