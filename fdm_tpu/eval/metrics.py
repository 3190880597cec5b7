"""Evaluation metrics: FVE / LVE / EME (MEAD-FLAME) and MVE / LVE / FDD /
Diversity (BIWI-style), numerically identical to the reference CLIs
(reference metric/metric.py:115-138 and computer_metrix.py:86,124-193) but
vectorized — the reference builds a Python list comprehension over region
vertex ids (one (T, 3) slice per vertex); here every metric is one fancy-index
gather plus reductions, host-side numpy (these run over saved .npy files, not
on the TPU hot path).

Conventions (matching the reference exactly):
  * sequences are (T, V, 3) float arrays; gt/pred are trimmed to the common
    frame count before accumulation (reference metric/metric.py:80-82);
  * "squared L2 per vertex" means sum over the 3 coordinates of the squared
    difference (reference metric.py:115-117);
  * FVE/LVE take the per-frame MAX over the region then average over all
    frames of all sequences pooled together; EME takes the per-frame MEAN
    (reference metric.py:115-133);
  * FDD compares the std-over-time of the squared displacement magnitude
    (motion = vertices - template), averaged over region vertices, per
    sequence, then averages gt-pred differences over sequences
    (reference computer_metrix.py:97-112,134-135);
  * Diversity is the mean pairwise MVE across identity-conditioned
    predictions of the same clip (reference computer_metrix.py:172-190).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _as_tv3(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x)
    if x.ndim == 2:  # (T, V*3)
        x = x.reshape(x.shape[0], -1, 3)
    if x.ndim != 3 or x.shape[-1] != 3:
        raise ValueError(f"expected (T, V, 3) or (T, V*3), got {x.shape}")
    return x


def squared_vertex_error(gt: np.ndarray, pred: np.ndarray,
                         region: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-frame, per-vertex squared L2 error (T, |region|)."""
    gt, pred = _as_tv3(gt), _as_tv3(pred)
    if region is not None:
        gt = gt[:, region]
        pred = pred[:, region]
    return np.sum(np.square(gt - pred), axis=-1)


def region_vertex_error(gt: np.ndarray, pred: np.ndarray,
                        region: Optional[np.ndarray] = None,
                        reduce: str = "max") -> np.ndarray:
    """Per-frame region error: max (FVE/LVE) or mean (EME) of the squared
    vertex error over the region. Returns (T,)."""
    err = squared_vertex_error(gt, pred, region)
    if err.shape[1] == 0:
        raise ValueError(
            "region selects zero vertices (empty id array — check the "
            "region file / weight threshold)"
        )
    if reduce == "max":
        return err.max(axis=1)
    if reduce == "mean":
        return err.mean(axis=1)
    raise ValueError(f"reduce must be 'max' or 'mean', got {reduce!r}")


def mean_vertex_error(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """Per-frame mean Euclidean vertex distance (T,) — BIWI MVE
    (reference computer_metrix.py:124-125)."""
    gt, pred = _as_tv3(gt), _as_tv3(pred)
    return np.linalg.norm(gt - pred, axis=2).mean(axis=1)


def region_motion_std(vertices: np.ndarray, template: np.ndarray,
                      region: np.ndarray) -> float:
    """Mean over region vertices of std-over-time of the squared displacement
    magnitude (the FDD building block, reference computer_metrix.py:97-104)."""
    motion = _as_tv3(vertices) - _as_tv3(template.reshape(1, -1, 3))
    mag = np.sum(np.square(motion[:, region]), axis=-1)  # (T, |region|)
    return float(np.mean(np.std(mag, axis=0)))


def fdd(gt: np.ndarray, pred: np.ndarray, template: np.ndarray,
        region: np.ndarray) -> float:
    """Per-sequence FDD term: gt motion-std minus pred motion-std over the
    (upper-face) region."""
    return region_motion_std(gt, template, region) - region_motion_std(
        pred, template, region
    )


def diversity(predictions: Sequence[np.ndarray]) -> float:
    """Mean pairwise frame-averaged vertex distance across >=2 predictions of
    the same clip under different identity conditions
    (reference computer_metrix.py:180-190)."""
    n = len(predictions)
    if n < 2:
        raise ValueError("diversity needs at least two conditioned predictions")
    preds = [_as_tv3(p) for p in predictions]
    total = 0.0
    for i in range(n - 1):
        for j in range(i + 1, n):
            T = min(preds[i].shape[0], preds[j].shape[0])
            total += float(
                np.linalg.norm(preds[i][:T] - preds[j][:T], axis=2)
                .mean(axis=1)
                .mean()
            )
    return total / (n * (n - 1) / 2)


class MetricAccumulator:
    """Streams (gt, pred) sequence pairs and reports the pooled metrics the
    reference CLIs print.

    regions: dict of name -> vertex-id array. Reductions per region follow
    the reference: 'face'/'lip'/'mouth'/'all' pool per-frame maxima ('FVE',
    'LVE', MVE-max), 'emotion' pools per-frame means ('EME'). An 'upper' (or
    'emotion' for MEAD) region additionally drives per-sequence FDD when a
    template is supplied."""

    # every region pools per-frame maxima unless listed in MEAN_REGIONS
    MEAN_REGIONS = ("emotion",)
    # output keys result() produces besides the per-region metrics; a user
    # region may not shadow them
    RESERVED_KEYS = ("num_frames", "num_sequences", "ave", "mve", "fdd",
                     "abs_fdd")

    def __init__(self, regions: Dict[str, np.ndarray],
                 fdd_region: Optional[str] = None):
        self.regions = {k: np.asarray(v, dtype=np.int64)
                        for k, v in regions.items()}
        for name, ids in self.regions.items():
            if ids.size == 0:
                raise ValueError(
                    f"region {name!r} selects zero vertices (empty id "
                    "array — check the region file / weight threshold)"
                )
            if name in self.RESERVED_KEYS:
                raise ValueError(
                    f"region name {name!r} collides with a reserved "
                    f"output key; reserved: {self.RESERVED_KEYS}"
                )
        if fdd_region is not None and fdd_region not in self.regions:
            raise ValueError(
                f"fdd_region {fdd_region!r} is not a region; have "
                f"{sorted(self.regions)}"
            )
        self.fdd_region = fdd_region
        self._frame_errors: Dict[str, list] = {k: [] for k in self.regions}
        # the automatic full-vertex per-frame max gets its own series so a
        # user region named 'all' cannot interleave with it
        self._full_max_frames: list = []
        self._mve_frames: list = []
        self._fdd_terms: list = []
        self._abs_fdd_terms: list = []
        self.num_frames = 0
        self.num_sequences = 0

    def update(self, gt: np.ndarray, pred: np.ndarray,
               template: Optional[np.ndarray] = None) -> None:
        gt, pred = _as_tv3(gt), _as_tv3(pred)
        T = min(gt.shape[0], pred.shape[0])
        gt, pred = gt[:T], pred[:T]
        self.num_frames += T
        self.num_sequences += 1

        self._full_max_frames.append(region_vertex_error(gt, pred))
        for name, region in self.regions.items():
            reduce = "mean" if name in self.MEAN_REGIONS else "max"
            self._frame_errors[name].append(
                region_vertex_error(gt, pred, region, reduce)
            )
        self._mve_frames.append(mean_vertex_error(gt, pred))

        if self.fdd_region is not None and template is not None:
            term = fdd(gt, pred, template, self.regions[self.fdd_region])
            self._fdd_terms.append(term)
            self._abs_fdd_terms.append(abs(term))

    def result(self) -> Dict[str, float]:
        out: Dict[str, float] = {
            "num_frames": float(self.num_frames),
            "num_sequences": float(self.num_sequences),
        }
        if self._full_max_frames:
            out["ave"] = float(np.mean(np.concatenate(self._full_max_frames)))
        name_map = {"face": "fve", "lip": "lve", "mouth": "lve",
                    "emotion": "eme"}
        for name, chunks in self._frame_errors.items():
            if not chunks:
                continue
            key = name_map.get(name, name)
            if key in out:
                # two regions mapping to one key ('lip' + 'mouth' both mean
                # LVE): keep both, the second under its own region name —
                # suffixed if that STILL collides (a region literally named
                # 'fve' next to 'face')
                key = name if name not in out else f"{name}_region"
            out[key] = float(np.mean(np.concatenate(chunks)))
        if self._mve_frames:
            out["mve"] = float(np.mean(np.concatenate(self._mve_frames)))
        if self._fdd_terms:
            out["fdd"] = float(np.mean(self._fdd_terms))
            out["abs_fdd"] = float(np.mean(self._abs_fdd_terms))
        return out
