"""The packaged correlation analysis (fdm_tpu/eval/correlation.py + the
`correlation` CLI): a perfect model scores matched >> mismatched, a
constant (non-learning) model scores ~0 on both, and the CLI shares the
sampler's split so names always line up (round-3 VERDICT item 1)."""

import json
import os

import numpy as np
import pytest

from fdm_tpu.cli.common import build_config, load_splits
from fdm_tpu.data.synthetic import envelope_to_motion, frame_rms_envelope
from fdm_tpu.eval.correlation import correlation_report, temporal_corr


class _Args:
    """The synthetic-args surface load_splits consumes."""

    def __init__(self, dataset, size=6, seed=0, tiny=True):
        self.dataset = dataset
        self.tiny = tiny
        self.synthetic = True
        self.synthetic_mode = "correlated"
        self.synthetic_size = size
        self.seed = seed
        self.overrides = []
        self.data_root = None


def test_temporal_corr_invariant_to_static_offset():
    rng = np.random.RandomState(0)
    a = rng.randn(20, 9).astype(np.float32)
    offset = rng.randn(1, 9).astype(np.float32) * 100
    assert temporal_corr(a, a + offset) == pytest.approx(1.0, abs=1e-5)
    assert abs(temporal_corr(a, rng.randn(20, 9))) < 0.5


def _write_preds(tmp_path, records, fn):
    d = tmp_path / "preds"
    d.mkdir(exist_ok=True)
    for rec in records:
        np.save(d / f"{rec.name}.npy", fn(rec))
    return str(d)


def test_perfect_and_constant_models_separate(tmp_path):
    # full-size clip lengths (40-120 frames): tiny's 16-32-frame clips
    # carry only ~2 envelope bumps, so even mismatched envelopes correlate
    # by chance and the control loses its power (measured: perfect-model
    # delta 0.07 tiny vs 1.02 at rehearsal lengths)
    args = _Args("vocaset", size=32, tiny=False)
    cfg = build_config(args)
    records = load_splits(cfg, args).test
    assert len(records) >= 2

    # perfect model: prediction == GT motion (+ template, like the sampler)
    perfect = _write_preds(
        tmp_path, records, lambda r: r.motion + r.template
    )
    rep = correlation_report(records, perfect, config=cfg, recompute_gt=True)
    assert rep["matched_corr_mean"] > 0.95
    assert rep["delta"] > 0.5

    # constant model: no temporal signal -> both correlations ~0
    const = _write_preds(
        tmp_path, records,
        lambda r: np.tile(r.template, (len(r.motion), 1)),
    )
    rep0 = correlation_report(records, const, config=cfg, recompute_gt=True)
    assert abs(rep0["matched_corr_mean"]) < 0.2
    assert rep0["delta"] < 0.5


def test_recomputed_gt_matches_record_motion():
    """recompute_gt's (i, i) ground truth must equal the record's own
    motion — the property that ties the analysis to the training data."""
    args = _Args("biwi")
    cfg = build_config(args)
    records = load_splits(cfg, args).test
    for rec in records:
        env = frame_rms_envelope(
            rec.audio, len(rec.motion), cfg.dataset.fps, cfg.dataset.audio_sr
        )
        m = envelope_to_motion(env, rec.style_one_hot, rec.emotion_one_hot,
                               cfg)
        np.testing.assert_array_equal(m, rec.motion)


def test_missing_prediction_raises(tmp_path):
    args = _Args("biwi")
    cfg = build_config(args)
    records = load_splits(cfg, args).test
    with pytest.raises(FileNotFoundError):
        correlation_report(records, str(tmp_path), config=cfg,
                           recompute_gt=True)


def test_correlation_cli_gate(tmp_path):
    """End-to-end CLI on tiny MEAD (FLAME-param records, synthetic FLAME
    decode): perfect predictions pass --min_delta 0.5; the report lands
    as JSON; a constant model fails the gate."""
    from fdm_tpu.cli.correlation import main as corr_main
    from fdm_tpu.cli.common import FlameDecoder

    import jax.numpy as jnp

    args = _Args("mead")
    cfg = build_config(args)
    records = load_splits(cfg, args).test
    flame = FlameDecoder(cfg)
    perfect = _write_preds(
        tmp_path, records,
        lambda r: np.asarray(flame(jnp.asarray(r.motion[None]))[0]),
    )
    out = tmp_path / "corr.json"
    argv = [
        "--dataset", "mead", "--tiny", "--synthetic",
        "--synthetic_mode", "correlated", "--synthetic_size", "6",
        "--pred_path", perfect, "--json_out", str(out),
        "--min_delta", "0.5",
    ]
    assert corr_main(argv) == 0
    rep = json.loads(out.read_text())
    assert rep["matched_corr_mean"] > 0.9
    assert len(rep["clips"]) == len(records)

    const = _write_preds(
        tmp_path, records,
        lambda r: np.zeros((len(r.motion), cfg.dataset.in_dim), np.float32),
    )
    argv[argv.index(perfect)] = const
    assert corr_main(argv) == 1


def test_correlation_cli_oracle_matches_sample_vqvae(tmp_path):
    """--oracle (in-process codec roundtrip) must produce the SAME report
    as the sample-vqvae CLI + --pred_path two-step: both init the codec
    from PRNGKey(seed) on the same first-record shapes, so predictions are
    bit-identical and only the plumbing differs."""
    from fdm_tpu.cli.correlation import main as corr_main
    from fdm_tpu.cli.sample_vqvae import main as vq_main

    base = ["--dataset", "mead", "--tiny", "--synthetic",
            "--synthetic_mode", "correlated", "--synthetic_size", "6"]
    pred = tmp_path / "vq"
    assert vq_main(base + ["--output_dir", str(pred)]) == 0
    disk_out = tmp_path / "disk.json"
    oracle_out = tmp_path / "oracle.json"
    assert corr_main(
        base + ["--pred_path", str(pred), "--json_out", str(disk_out)]
    ) == 0
    assert corr_main(
        base + ["--oracle", "--json_out", str(oracle_out)]
    ) == 0
    disk = json.loads(disk_out.read_text())
    oracle = json.loads(oracle_out.read_text())
    assert oracle["matched_corr_mean"] == pytest.approx(
        disk["matched_corr_mean"], abs=1e-5
    )
    assert oracle["delta"] == pytest.approx(disk["delta"], abs=1e-5)


def test_correlation_cli_requires_pred_path_or_oracle():
    from fdm_tpu.cli.correlation import main as corr_main

    with pytest.raises(SystemExit):
        corr_main(["--dataset", "mead", "--tiny", "--synthetic"])


def test_correlation_report_preds_mapping():
    """In-memory predictions (the --oracle plumbing) behave exactly like
    on-disk ones, including the missing-record error."""
    args = _Args("biwi")
    cfg = build_config(args)
    records = load_splits(cfg, args).test
    preds = {r.name: r.motion + r.template for r in records}
    rep = correlation_report(records, None, config=cfg, recompute_gt=True,
                             preds=preds)
    assert rep["matched_corr_mean"] > 0.9
    with pytest.raises(KeyError):
        correlation_report(records, None, config=cfg, recompute_gt=True,
                           preds={})
