"""Learning evidence for the correlated-synthetic rehearsal: temporal
correlation between sampled motion and ground truth, matched vs
MISMATCHED-audio controls.

The correlated synthetic task (fdm_tpu/data/synthetic.py) makes motion a
deterministic function of the audio envelope, so ground truth is
recomputable for ANY (audio, style, emotion) combination. A model that
learned the audio->motion correspondence correlates far better with the
motion derived from its OWN clip's audio than with motion derived from
another clip's audio under the same style/emotion — the same control the
tiny e2e test uses (tests/test_correlated_synthetic.py). Time-reversal
controls through the FVE/LVE metrics CLI are NOT sufficient: those metrics
compare frame sets per index, so a near-constant prediction scores
identically against reversed GT (observed in runs_r3corr take 1).

Correlation is computed on time-centered vertex trajectories (the static
face carries no information about learning), flattened over (T, V*3).
"""

import argparse
import json

import numpy as np


def temporal_corr(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation of time-centered trajectories, flattened.

    Time-centering removes every static component (FLAME template /
    BIWI-VOCASET neutral-face vertices), so predictions that include the
    template compare cleanly against template-free GT motion."""
    n = min(len(a), len(b))
    a = a[:n].reshape(n, -1) - a[:n].reshape(n, -1).mean(0)
    b = b[:n].reshape(n, -1) - b[:n].reshape(n, -1).mean(0)
    num = float((a * b).sum())
    den = float(np.sqrt((a * a).sum() * (b * b).sum())) + 1e-12
    return num / den


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", required=True, help="sampled .npy directory")
    ap.add_argument("--dataset", default="mead",
                    choices=("mead", "vocaset", "biwi"))
    ap.add_argument("--size", type=int, default=64, help="--synthetic_size")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json_out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from fdm_tpu.cli.common import FlameDecoder, build_config
    from fdm_tpu.data.synthetic import (
        envelope_to_motion,
        frame_rms_envelope,
        synthetic_splits,
    )

    class _A:
        dataset, tiny, overrides, data_root = args.dataset, False, [], None
        synthetic, seed = True, args.seed

    cfg = build_config(_A)
    splits = synthetic_splits(
        cfg, num_train=args.size, num_eval=max(2, args.size // 8),
        seed=args.seed, mode="correlated",
    )
    if cfg.dataset.uses_flame_params:
        flame = FlameDecoder(cfg)

        def decode(params: np.ndarray) -> np.ndarray:
            import jax.numpy as jnp

            v = flame(jnp.asarray(params[None]))
            return np.asarray(v[0])
    else:
        # BIWI/VOCASET motion already lives in vertex space; the template
        # offset the sampler adds is constant and cancels in temporal_corr
        def decode(params: np.ndarray) -> np.ndarray:
            return params

    records = splits.test
    envs = [
        frame_rms_envelope(
            r.audio, len(r.motion), cfg.dataset.fps, cfg.dataset.audio_sr
        )
        for r in records
    ]
    results = []
    for i, rec in enumerate(records):
        pred = np.load(f"{args.pred}/{rec.name}.npy")
        gt = decode(
            envelope_to_motion(
                envs[i], rec.style_one_hot, rec.emotion_one_hot, cfg
            )
        )
        matched = temporal_corr(pred, gt)
        mism = []
        for j in range(len(records)):
            if j == i:
                continue
            alt = decode(
                envelope_to_motion(
                    envs[j], rec.style_one_hot, rec.emotion_one_hot, cfg
                )
            )
            mism.append(temporal_corr(pred, alt))
        results.append(
            {
                "clip": rec.name,
                "matched_corr": matched,
                "mismatched_corr_mean": float(np.mean(mism)),
                "mismatched_corrs": mism,
                "pred_temporal_std": float(
                    (pred - pred.mean(0)).std(0).mean()
                ),
                "gt_temporal_std": float((gt - gt.mean(0)).std(0).mean()),
            }
        )
        print(
            f"{rec.name}: matched={matched:+.4f} "
            f"mismatched_mean={np.mean(mism):+.4f} "
            f"(pred std {results[-1]['pred_temporal_std']:.6f}, "
            f"gt std {results[-1]['gt_temporal_std']:.6f})"
        )

    summary = {
        "matched_corr_mean": float(
            np.mean([r["matched_corr"] for r in results])
        ),
        "mismatched_corr_mean": float(
            np.mean([r["mismatched_corr_mean"] for r in results])
        ),
        "clips": results,
    }
    print(
        f"SUMMARY matched={summary['matched_corr_mean']:+.4f} "
        f"mismatched={summary['mismatched_corr_mean']:+.4f}"
    )
    with open(args.json_out, "w") as f:
        json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
