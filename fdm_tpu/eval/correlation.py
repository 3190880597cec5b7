"""Matched-vs-mismatched temporal-correlation analysis: the learning
evidence for audio->motion models.

A model that learned the audio->motion correspondence correlates far
better with the ground-truth motion derived from its OWN clip's audio
than with motion derived from ANOTHER clip's audio under the same
style/emotion conditioning. This is the direct, order-sensitive control
the correlated-synthetic rehearsals use (fdm_tpu/data/synthetic.py);
frame-set metrics such as FVE/LVE (reference metric/metric.py:115-138)
are NOT order-sensitive — a near-constant prediction scores identically
against time-reversed ground truth, which is exactly how the round-3
rehearsal's null result stayed invisible.

Promoted into the package (from runs_r3corr2/analyze_correlation.py) so
the analysis shares the CLI's split construction (`load_splits`) and can
never silently lose PYTHONPATH or drift from the sampler's test split
again (round-3 VERDICT item 1, ADVICE medium item).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np


def temporal_corr(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation of time-centered trajectories, flattened over
    (T, V*3). Time-centering removes every static component (FLAME
    template / BIWI-VOCASET neutral face), so predictions that include
    the template compare cleanly against template-free ground truth."""
    n = min(len(a), len(b))
    a = a[:n].reshape(n, -1) - a[:n].reshape(n, -1).mean(0)
    b = b[:n].reshape(n, -1) - b[:n].reshape(n, -1).mean(0)
    num = float((a * b).sum())
    den = float(np.sqrt((a * a).sum() * (b * b).sum())) + 1e-12
    return num / den


def correlation_report(
    records: Sequence,
    pred_dir: Optional[str],
    *,
    config=None,
    decode: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    recompute_gt: bool = False,
    max_mismatched: Optional[int] = 32,
    preds: Optional[dict] = None,
) -> dict:
    """Per-clip matched vs mismatched correlations for `<name>.npy`
    predictions in `pred_dir` against `records` (a test split).

    ``preds`` (a {record_name: array} mapping) replaces the on-disk
    ``pred_dir`` for in-process callers — the correlation CLI's --oracle
    mode scores the codec roundtrip without a filesystem round trip.

    With ``recompute_gt`` (correlated-synthetic mode) the ground truth for
    every (pred_i, audio_j) pair is recomputed from clip j's audio under
    clip i's style/emotion via the deterministic envelope map — the
    strongest control, since only the audio varies. Otherwise the
    mismatched controls are the other records' own motion (audio AND
    conditioning differ; adequate for real data where the map is unknown).

    ``decode`` maps a GT motion array to prediction space (e.g. FLAME
    params -> vertices for MEAD); identity when None.

    ``max_mismatched`` bounds the mismatched controls per clip (sampled
    deterministically per clip). Every (i, j) control costs a GT
    recompute + decode; the full quadratic sweep at a 512-clip split is
    ~262k FLAME decodes — hours — while 32 controls per clip estimate
    the mismatched mean to the same conclusion. None = all pairs.
    """
    decode = decode if decode is not None else (lambda m: m)
    if recompute_gt:
        if config is None:
            raise ValueError("recompute_gt needs the pipeline config")
        from fdm_tpu.data.synthetic import (
            envelope_to_motion,
            frame_rms_envelope,
        )

        ds = config.dataset
        envs = [
            frame_rms_envelope(r.audio, len(r.motion), ds.fps, ds.audio_sr)
            for r in records
        ]

        def gt_for(i: int, j: int) -> np.ndarray:
            """GT motion from clip j's audio under clip i's conditioning."""
            return decode(
                envelope_to_motion(
                    envs[j],
                    records[i].style_one_hot,
                    records[i].emotion_one_hot,
                    config,
                )
            )

    else:

        def gt_for(i: int, j: int) -> np.ndarray:
            return decode(records[j].motion)

    results = []
    for i, rec in enumerate(records):
        if preds is not None:
            if rec.name not in preds:
                raise KeyError(f"no prediction for test record {rec.name!r}")
            pred = np.asarray(preds[rec.name])
        else:
            path = os.path.join(pred_dir, rec.name + ".npy")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"no prediction for test record {rec.name!r} at {path}"
                )
            pred = np.load(path)
        gt = gt_for(i, i)
        matched = temporal_corr(pred, gt)
        js = np.array([j for j in range(len(records)) if j != i])
        if max_mismatched is not None and len(js) > max_mismatched:
            js = np.random.RandomState(1000 + i).choice(
                js, size=max_mismatched, replace=False
            )
        mism = [temporal_corr(pred, gt_for(i, int(j))) for j in js]
        results.append(
            {
                "clip": rec.name,
                "matched_corr": matched,
                "mismatched_corr_mean": float(np.mean(mism)) if mism else 0.0,
                "mismatched_corrs": mism,
                "pred_temporal_std": float(
                    (pred - pred.mean(0)).std(0).mean()
                ),
                "gt_temporal_std": float((gt - gt.mean(0)).std(0).mean()),
            }
        )

    matched_mean = float(np.mean([r["matched_corr"] for r in results]))
    mismatched_mean = float(
        np.mean([r["mismatched_corr_mean"] for r in results])
    )
    return {
        "matched_corr_mean": matched_mean,
        "mismatched_corr_mean": mismatched_mean,
        "delta": matched_mean - mismatched_mean,
        "clips": results,
    }
