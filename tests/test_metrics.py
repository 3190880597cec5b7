"""Metric parity tests: fdm_tpu.eval vs naive loops transcribing the
reference math (reference metric/metric.py:115-138, computer_metrix.py:86-193)."""

import numpy as np
import pytest

from fdm_tpu.eval import (
    MetricAccumulator,
    diversity,
    fdd,
    mean_vertex_error,
    region_motion_std,
    region_vertex_error,
)

rng = np.random.RandomState(0)


def _naive_region_error(gt, pred, region, reduce):
    # reference metric/metric.py:115-118 — per-vertex python loop
    per_vertex = np.array(
        [np.square(gt[:, v, :] - pred[:, v, :]) for v in region]
    )  # (|R|, T, 3)
    per_vertex = np.transpose(per_vertex, (1, 0, 2))
    summed = np.sum(per_vertex, axis=2)  # (T, |R|)
    return summed.max(axis=1) if reduce == "max" else summed.mean(axis=1)


def _naive_motion_std(vertices, template, region):
    # reference computer_metrix.py:97-104
    motion = vertices - template.reshape(1, -1, 3)
    arr = np.array([np.square(motion[:, v, :]) for v in region])
    arr = np.transpose(arr, (1, 0, 2))
    arr = np.sum(arr, axis=2)
    return float(np.mean(np.std(arr, axis=0)))


@pytest.fixture
def seqs():
    T, V = 17, 40
    gt = rng.randn(T, V, 3).astype(np.float32)
    pred = gt + 0.05 * rng.randn(T, V, 3).astype(np.float32)
    region = rng.choice(V, size=11, replace=False)
    template = rng.randn(V, 3).astype(np.float32)
    return gt, pred, region, template


def test_region_error_max_matches_reference_loop(seqs):
    gt, pred, region, _ = seqs
    ours = region_vertex_error(gt, pred, region, reduce="max")
    ref = _naive_region_error(gt, pred, region, "max")
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_region_error_mean_matches_reference_loop(seqs):
    gt, pred, region, _ = seqs
    ours = region_vertex_error(gt, pred, region, reduce="mean")
    ref = _naive_region_error(gt, pred, region, "mean")
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_motion_std_and_fdd_match_reference_loop(seqs):
    gt, pred, region, template = seqs
    assert region_motion_std(gt, template, region) == pytest.approx(
        _naive_motion_std(gt, template, region), rel=1e-6
    )
    expected = _naive_motion_std(gt, template, region) - _naive_motion_std(
        pred, template, region
    )
    assert fdd(gt, pred, template, region) == pytest.approx(expected, rel=1e-6)


def test_mve_matches_reference(seqs):
    gt, pred, _, _ = seqs
    # reference computer_metrix.py:124-125
    ref = np.linalg.norm(gt - pred, axis=2).mean(axis=1)
    np.testing.assert_allclose(mean_vertex_error(gt, pred), ref, rtol=1e-6)


def test_diversity_matches_reference_pairwise():
    T, V = 9, 20
    preds = [rng.randn(T, V, 3) for _ in range(4)]
    total = 0.0
    for i in range(3):
        for j in range(i + 1, 4):
            total += np.linalg.norm(preds[i] - preds[j], axis=2).mean(axis=1).mean()
    assert diversity(preds) == pytest.approx(total / 6.0, rel=1e-6)
    with pytest.raises(ValueError):
        diversity(preds[:1])


def test_accumulator_pools_frames_across_sequences(seqs):
    gt, pred, region, template = seqs
    gt2 = rng.randn(11, gt.shape[1], 3).astype(np.float32)
    pred2 = gt2 + 0.1 * rng.randn(*gt2.shape).astype(np.float32)

    acc = MetricAccumulator(
        {"lip": region, "emotion": region}, fdd_region="emotion"
    )
    acc.update(gt, pred, template)
    acc.update(gt2, pred2, template)
    res = acc.result()

    # pooled LVE: per-frame maxima concatenated across sequences, then mean
    lve_ref = np.mean(
        np.concatenate(
            [
                _naive_region_error(gt, pred, region, "max"),
                _naive_region_error(gt2, pred2, region, "max"),
            ]
        )
    )
    eme_ref = np.mean(
        np.concatenate(
            [
                _naive_region_error(gt, pred, region, "mean"),
                _naive_region_error(gt2, pred2, region, "mean"),
            ]
        )
    )
    assert res["lve"] == pytest.approx(lve_ref, rel=1e-6)
    assert res["eme"] == pytest.approx(eme_ref, rel=1e-6)
    assert res["num_sequences"] == 2
    assert res["num_frames"] == gt.shape[0] + gt2.shape[0]
    assert "fdd" in res and "abs_fdd" in res and "mve" in res and "ave" in res


def test_accumulator_trims_to_common_length(seqs):
    gt, pred, region, _ = seqs
    acc = MetricAccumulator({"lip": region})
    acc.update(gt, pred[:10])  # pred shorter
    assert acc.result()["num_frames"] == 10


def test_flat_input_accepted(seqs):
    gt, pred, region, _ = seqs
    flat = region_vertex_error(
        gt.reshape(gt.shape[0], -1), pred.reshape(pred.shape[0], -1), region
    )
    np.testing.assert_allclose(
        flat, region_vertex_error(gt, pred, region), rtol=1e-6
    )


def test_region_file_formats(tmp_path):
    """The metric CLI reads all three reference region formats."""
    from fdm_tpu.cli.metrics import _load_region

    # .npy indices
    p = str(tmp_path / "r.npy")
    np.save(p, np.array([3, 1, 4]))
    np.testing.assert_array_equal(_load_region(p), [3, 1, 4])

    # comma-separated ints (BIWI lve.txt style)
    p = str(tmp_path / "lve.txt")
    open(p, "w").write("100, 205, 3001, 7")
    np.testing.assert_array_equal(_load_region(p), [100, 205, 3001, 7])

    # one weight per line (multiface weighted masks)
    p = str(tmp_path / "mask.txt")
    open(p, "w").write("0.0\n0.5\n0.05\n0.2\n1.0\n")
    np.testing.assert_array_equal(
        _load_region(p, weight_threshold=0.1), [1, 3, 4]
    )
    np.testing.assert_array_equal(
        _load_region(p, weight_threshold=0.4), [1, 4]
    )


def test_accumulator_all_region_and_lve_collision():
    """A user region named 'all' must not corrupt the automatic full-vertex
    'ave' series, and supplying both 'lip' and 'mouth' keeps both results
    (round-2 review findings)."""
    import numpy as np

    from fdm_tpu.eval.metrics import MetricAccumulator

    rng = np.random.default_rng(0)
    gt = rng.normal(size=(4, 10, 3))
    pred = gt + 0.1
    sub = np.arange(3)
    acc = MetricAccumulator(
        regions={"all": sub, "lip": np.arange(2), "mouth": np.arange(4, 6)}
    )
    acc.update(gt, pred)
    out = acc.result()
    # 'ave' is the full-vertex max, not polluted by the subset region
    err = np.sum(np.square(gt - pred), axis=-1)
    np.testing.assert_allclose(out["ave"], err.max(axis=1).mean(), rtol=1e-6)
    np.testing.assert_allclose(
        out["all"], err[:, sub].max(axis=1).mean(), rtol=1e-6
    )
    # both lip-style regions survive: one under 'lve', the other under its
    # own name
    assert "lve" in out and "mouth" in out
    np.testing.assert_allclose(
        out["lve"], err[:, :2].max(axis=1).mean(), rtol=1e-6
    )
    np.testing.assert_allclose(
        out["mouth"], err[:, 4:6].max(axis=1).mean(), rtol=1e-6
    )


def test_multiface_weighted_mask_branch_end_to_end(tmp_path, capsys):
    """The reference's alternate metric branch (multiface-style weighted
    masks, nr_vertices!=BIWI, reference computer_metrix.py:36-55): weighted
    mouth/forehead mask files threshold (>0.1 / >0.4) into index regions,
    then the SAME MVE/LVE/FDD math runs over them. Drive the metrics CLI
    end-to-end on synthetic data and compare every number against a direct
    transliteration of the reference script."""
    import json
    import pickle

    from fdm_tpu.cli import metrics as metrics_cli

    V, T = 20, 6
    stems = ["F2_e46", "M3_e47"]
    gt_dir, pred_dir = tmp_path / "gt", tmp_path / "pred"
    gt_dir.mkdir(); pred_dir.mkdir()
    data = {}
    for i, stem in enumerate(stems):
        r = np.random.RandomState(10 + i)
        gt = r.randn(T, V, 3).astype(np.float32)
        pred = gt + 0.1 * r.randn(T, V, 3).astype(np.float32)
        np.save(gt_dir / f"{stem}.npy", gt)
        np.save(pred_dir / f"{stem}.npy", pred)
        data[stem] = (gt, pred)

    mouth_w = np.random.RandomState(3).rand(V)
    upper_w = np.random.RandomState(4).rand(V)
    (tmp_path / "weighted_mouth_mask.txt").write_text(
        "\n".join(str(v) for v in mouth_w)
    )
    (tmp_path / "forehead_mask.txt").write_text(
        "\n".join(str(v) for v in upper_w)
    )
    templates = {
        "F2": np.random.RandomState(5).randn(V * 3).astype(np.float32),
        "M3": np.random.RandomState(6).randn(V * 3).astype(np.float32),
    }
    with open(tmp_path / "templates.pkl", "wb") as f:
        pickle.dump(templates, f)

    assert metrics_cli.main([
        "--pred_path", str(pred_dir), "--gt_path", str(gt_dir),
        "--lip_region", str(tmp_path / "weighted_mouth_mask.txt"),
        "--upper_region", str(tmp_path / "forehead_mask.txt"),
        "--templates", str(tmp_path / "templates.pkl"),
        "--json",
    ]) == 0
    results = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # ---- straight-line transliteration of computer_metrix.py ----
    mouth_map = [i for i, v in enumerate(mouth_w) if v > 0.1]   # :42-48
    upper_map = [i for i, v in enumerate(upper_w) if v > 0.4]   # :50-55
    gt_all, pred_all, std_diff, abs_std_diff = [], [], [], []
    for stem in sorted(stems):
        gt, pred = data[stem]
        subject = stem.split("_")[0]
        temp = templates[subject].reshape(V, 3)
        gt_all.extend(list(gt))                                  # :84-85
        pred_all.extend(list(pred))
        motion_gt = gt - temp[None]                              # :92-93
        motion_pred = pred - temp[None]
        for motion, out in ((motion_gt, "gt"), (motion_pred, "pred")):
            L2 = np.array([np.square(motion[:, v, :]) for v in upper_map])
            L2 = np.transpose(L2, (1, 0, 2)).sum(axis=2)
            L2 = np.std(L2, axis=0)
            if out == "gt":
                gt_std = np.mean(L2)                             # :96-101
            else:
                pred_std = np.mean(L2)                           # :103-107
        std_diff.append(gt_std - pred_std)                       # :109
        abs_std_diff.append(abs(gt_std - pred_std))              # :110
    gt_all = np.array(gt_all); pred_all = np.array(pred_all)
    mve_ref = np.mean(np.linalg.norm(gt_all - pred_all, axis=2))  # :124-125
    L2m = np.array([np.square(gt_all[:, v, :] - pred_all[:, v, :])
                    for v in mouth_map])
    L2m = np.transpose(L2m, (1, 0, 2)).sum(axis=2).max(axis=1)    # :127-130
    lve_ref = np.mean(L2m)                                        # :133
    fdd_ref = sum(std_diff) / len(std_diff)                       # :134
    abs_fdd_ref = sum(abs_std_diff) / len(abs_std_diff)           # :135

    np.testing.assert_allclose(results["mve"], mve_ref, rtol=1e-5)
    np.testing.assert_allclose(results["lve"], lve_ref, rtol=1e-5)
    np.testing.assert_allclose(results["fdd"], fdd_ref, rtol=1e-5)
    np.testing.assert_allclose(results["abs_fdd"], abs_fdd_ref, rtol=1e-5)


def test_accumulator_validates_configuration_up_front():
    """Empty regions, unknown fdd_region, and reserved-key region names all
    fail at construction with actionable messages instead of mid-run
    KeyError/zero-size-reduction crashes (round-3 review findings)."""
    import numpy as np
    import pytest

    from fdm_tpu.eval.metrics import MetricAccumulator, region_vertex_error

    with pytest.raises(ValueError, match="zero vertices"):
        MetricAccumulator({"lip": np.array([], dtype=np.int64)})
    with pytest.raises(ValueError, match="not a region"):
        MetricAccumulator({"lip": np.arange(2)}, fdd_region="upper")
    with pytest.raises(ValueError, match="reserved"):
        MetricAccumulator({"ave": np.arange(2)})
    # the free function guards empty regions too (direct users)
    gt = np.zeros((2, 4, 3))
    with pytest.raises(ValueError, match="zero vertices"):
        region_vertex_error(gt, gt, np.array([], dtype=np.int64))


def test_load_region_rejects_empty_selections(tmp_path):
    """An empty region file or an over-tight weight threshold must exit
    with an actionable message, not a zero-size numpy reduction error."""
    import pytest

    from fdm_tpu.cli.metrics import _load_region

    empty = tmp_path / "empty.txt"
    empty.write_text("")
    with pytest.raises(SystemExit, match="is empty"):
        _load_region(str(empty))
    weights = tmp_path / "w.txt"
    weights.write_text("0.05\n0.02\n0.01\n")
    with pytest.raises(SystemExit, match="zero vertices"):
        _load_region(str(weights), weight_threshold=2.0)
