"""Locate the test-split generalization bottleneck of the correlated
rehearsal (VERDICT r4 item 1 diagnosis, round-5 evidence).

The synthetic task's sufficient statistic is the per-frame RMS envelope:
motion = env*primary(style) + d(env)*velocity(style) + emotion_offset
(fdm_tpu/data/synthetic.py:139-160). The MEAD v8 rehearsal reaches the
oracle ceiling on the TRAIN split (sampled delta +0.967 vs oracle +0.970)
but plateaus at ~+0.27 on TEST — so the stack learns the map; the open
question is WHERE out-of-sample information is lost.

This probe answers it directly: run the TRAINED stage-2 audio encoder
(checkpoints/r5corr/stage2/*_audio_params_ema.msgpack) over train and test
clips, fit a ridge head features -> envelope on TRAIN frames only, and
score R^2 / per-clip correlation on BOTH splits:

  - trained encoder, test R^2 ~ train R^2  -> the envelope survives the
    encoder on unseen audio; the loss is downstream (FDM conditioning).
  - trained encoder, test R^2 << train R^2 -> the fine-tuned encoder
    memorized the 1024 training clips; audio-encoder generalization is
    the bottleneck (the from-scratch-HuBERT-on-1k-clips hypothesis).

A RANDOM-INIT encoder is the control: wav2vec2-style random conv+
transformer features are a strong envelope basis by construction, so its
test R^2 is the "no memorization" reference point.

CPU-only (the chip is running the rehearsal chains).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u runs_r5/envelope_probe.py
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fdm_tpu.cli.common import build_config, load_params  # noqa: E402
from fdm_tpu.data import synthetic_splits  # noqa: E402
from fdm_tpu.data.synthetic import frame_rms_envelope  # noqa: E402
from fdm_tpu.models.pipeline import LatentDiffusion  # noqa: E402

CK = "checkpoints/r5corr/stage2/mead_audio_params_ema.msgpack"
N_CLIPS = 40          # per split
BUCKET = 128          # frame bucket (clips are 40-120 frames)
RIDGE = 1e-2


class Args:
    dataset = "mead"
    synthetic = True
    tiny = False
    seed = 0
    overrides = []
    data_root = None


def collect(pipe, params, records, cfg, encode):
    """(frames x D features, frames x 1 envelope, clip slices)."""
    feats, envs, slices, at = [], [], [], 0
    sr, fps = cfg.dataset.audio_sr, cfg.dataset.fps
    for rec in records:
        T = rec.motion.shape[0]
        wav = rec.audio
        pad = np.zeros(int(BUCKET / fps * sr), np.float32)
        pad[: len(wav)] = wav[: len(pad)]
        hidden = encode(params, jnp.asarray(pad[None]))  # (1, BUCKET, D)
        feats.append(np.asarray(hidden[0][:T], np.float64))
        envs.append(frame_rms_envelope(wav, T, fps, sr).astype(np.float64))
        slices.append((at, at + T))
        at += T
    return np.concatenate(feats), np.concatenate(envs), slices


def fit_ridge(X, y):
    # closed form on centered data; D ~ 2k so the normal matrix is cheap
    mu, sd = X.mean(0), X.std(0) + 1e-8
    Xc = (X - mu) / sd
    w = np.linalg.solve(
        Xc.T @ Xc + RIDGE * len(X) * np.eye(X.shape[1]), Xc.T @ (y - y.mean())
    )
    return mu, sd, w, y.mean()


def score(model, X, y, slices):
    mu, sd, w, b = model
    pred = ((X - mu) / sd) @ w + b
    ss_res = ((y - pred) ** 2).sum()
    ss_tot = ((y - y.mean()) ** 2).sum()
    r2 = 1.0 - ss_res / ss_tot
    corrs = []
    for lo, hi in slices:
        p, g = pred[lo:hi], y[lo:hi]
        if p.std() > 1e-9 and g.std() > 1e-9:
            corrs.append(float(np.corrcoef(p, g)[0, 1]))
    return float(r2), float(np.mean(corrs))


def main():
    cfg = build_config(Args())
    splits = synthetic_splits(
        cfg, num_train=1024, num_eval=128, min_frames=40, max_frames=120,
        seed=0, with_audio=True, mode="correlated",
    )
    train = splits.train[:N_CLIPS]
    test = splits.test[:N_CLIPS]

    pipe = LatentDiffusion.create(cfg, with_audio_encoder=True)

    def encode(params, wav):
        return pipe.encode_audio(params, wav, BUCKET)

    encode = jax.jit(encode)

    out = {"n_clips_per_split": N_CLIPS, "ridge": RIDGE,
           "params": CK, "bucket": BUCKET}
    trained = load_params(CK)
    rand = jax.jit(pipe.audio_encoder.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, int(BUCKET / cfg.dataset.fps * cfg.dataset.audio_sr))),
    )
    for name, params in (("trained_ema", trained), ("random_init", rand)):
        Xtr, ytr, str_ = collect(pipe, params, train, cfg, encode)
        Xte, yte, ste = collect(pipe, params, test, cfg, encode)
        model = fit_ridge(Xtr, ytr)
        r2_tr, c_tr = score(model, Xtr, ytr, str_)
        r2_te, c_te = score(model, Xte, yte, ste)
        out[name] = {
            "train_r2": r2_tr, "train_clip_corr": c_tr,
            "test_r2": r2_te, "test_clip_corr": c_te,
        }
        print(f"{name}: train R2 {r2_tr:+.4f} corr {c_tr:+.4f} | "
              f"test R2 {r2_te:+.4f} corr {c_te:+.4f}", flush=True)

    with open("runs_r5/envelope_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote runs_r5/envelope_probe.json")


if __name__ == "__main__":
    main()
