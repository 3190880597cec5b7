"""Utility modules: param serialization round-trip, step timer, logging."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from fdm_tpu.utils.logging import MetricLogger
from fdm_tpu.utils.profiling import StepTimer
from fdm_tpu.utils.serialization import load_params, save_params


def test_params_roundtrip(tmp_path):
    params = {
        "params": {
            "dense": {"kernel": np.random.randn(4, 3).astype(np.float32),
                      "bias": np.zeros(3, np.float32)},
            "codebook": np.random.randn(16, 8).astype(np.float32),
        }
    }
    path = str(tmp_path / "p.msgpack")
    save_params(path, params)
    restored = load_params(path)
    # leaves come back as device arrays (indexable by tracers)
    leaf = restored["params"]["codebook"]
    assert isinstance(leaf, jax.Array)
    np.testing.assert_array_equal(
        np.asarray(leaf), params["params"]["codebook"]
    )
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["dense"]["kernel"]),
        params["params"]["dense"]["kernel"],
    )


def test_step_timer_discards_warmup():
    timer = StepTimer(warmup=2)
    f = jax.jit(lambda x: x * 2)
    timer.time_fn(f, jnp.ones(8), repeats=3)
    s = timer.summary()
    assert s["count"] == 3
    assert s["min_s"] <= s["median_s"] <= s["max_s"]


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path), "run", tensorboard=False)
    logger.log_step(1, {"loss": 0.5})
    logger.log_epoch(1, {"loss": 0.4, "steps": 10})
    logger.close()
    lines = [json.loads(l) for l in open(logger.path)]
    assert lines[0]["kind"] == "step" and lines[0]["loss"] == 0.5
    assert lines[1]["kind"] == "epoch" and lines[1]["steps"] == 10


def test_metric_logger_nonfinite_stays_valid_json(tmp_path):
    """val_recon=nan (empty eval split) must serialize as null, not a bare
    NaN token that breaks strict JSON consumers of the .jsonl."""
    logger = MetricLogger(str(tmp_path), "run", tensorboard=False)
    logger.log_epoch(1, {"val_recon": float("nan"), "up": float("inf")})
    logger.close()
    raw = open(logger.path).read()
    assert "NaN" not in raw and "Infinity" not in raw
    rec = json.loads(raw)  # strict parse succeeds
    assert rec["val_recon"] is None and rec["up"] is None


def test_error_paths_raise_cleanly():
    """User-facing misconfigurations fail with actionable messages."""
    import jax
    import jax.numpy as jnp
    import pytest

    from fdm_tpu.configs import get_config
    from fdm_tpu.cli.common import parse_override

    with pytest.raises(ValueError, match="unknown dataset"):
        get_config("nope")
    import argparse

    with pytest.raises(argparse.ArgumentTypeError, match="section.field"):
        parse_override("no_equals_sign")

    # denoise with misaligned audio frames names both lengths
    from test_pipeline import tiny_pipeline, init_pipeline

    cfg = tiny_pipeline()
    ld, _, fdm_params, motion, _, audio, style, emo = init_pipeline(cfg)
    B, T = motion.shape[:2]
    L = T * cfg.fdm.tokens_per_frame
    x_t = jnp.zeros((B, L, cfg.vqvae.zquant_dim))
    with pytest.raises(ValueError, match="must match latent"):
        ld.fdm.apply(
            fdm_params, x_t, jnp.zeros((B,), jnp.int32),
            audio[:, :-1], style, emo, method="denoise",
        )


def test_fill_missing_restores_new_params():
    """Artifacts saved before a parameter existed get the missing leaves
    from a fresh init (e.g. pre-SpecAugment audio encoders lacking
    masked_spec_embed)."""
    import jax.numpy as jnp

    from fdm_tpu.utils.serialization import fill_missing

    template = {"params": {"a": jnp.ones((2,)), "new": jnp.full((3,), 7.0),
                           "sub": {"w": jnp.zeros((2, 2))}}}
    old = {"params": {"a": jnp.full((2,), 5.0)}}
    out = fill_missing(old, template)
    assert float(out["params"]["a"][0]) == 5.0          # kept
    assert float(out["params"]["new"][0]) == 7.0        # filled
    assert out["params"]["sub"]["w"].shape == (2, 2)    # nested filled
    assert "new" not in old["params"]                   # input untouched


def test_tb_varint_rejects_negative():
    import pytest

    from fdm_tpu.utils.tb_events import _varint

    with pytest.raises(ValueError, match="non-negative"):
        _varint(-1)


def test_metric_logger_accepts_numpy_scalars(tmp_path):
    """np.float32/np.int64 metrics must hit the NaN guard, reach
    TensorBoard, and serialize — not raise at json.dumps (round-3 review
    finding)."""
    logger = MetricLogger(str(tmp_path), "run", tensorboard=False)
    logger.log_epoch(
        1,
        {"a": np.float32(0.25), "b": np.int64(3), "c": np.float32("nan")},
    )
    logger.close()
    rec = json.loads(open(logger.path).read())
    assert rec["a"] == 0.25 and rec["b"] == 3 and rec["c"] is None


def test_hw_dropout_key_rbg_rewrap():
    """ops.hw_dropout_key rewraps both key styles onto the rbg generator
    (the threefry dropout masks cost 65 ms of a 204 ms b16 train step on
    v5e); the result must split/fold/draw like any PRNG key and stay
    deterministic in the key data."""
    from fdm_tpu.ops import hw_dropout_key

    for key in (jax.random.PRNGKey(7), jax.random.key(7)):
        k = hw_dropout_key(key)
        assert jnp.issubdtype(k.dtype, jax.dtypes.prng_key)
        assert "rbg" in str(k.dtype)
        # same input key -> same rbg key (pure rewrap, no hidden state)
        np.testing.assert_array_equal(
            jax.random.key_data(k),
            jax.random.key_data(hw_dropout_key(key)),
        )
        a, b = jax.random.split(k)
        draws = jax.random.bernoulli(a, 0.5, (2048,))
        assert draws.dtype == jnp.bool_
        frac = float(jnp.mean(draws))
        assert 0.4 < frac < 0.6
        # distinct seeds give distinct bits
        other = hw_dropout_key(jax.random.PRNGKey(8))
        assert not np.array_equal(
            np.asarray(jax.random.bernoulli(k, 0.5, (128,))),
            np.asarray(jax.random.bernoulli(other, 0.5, (128,))),
        )
