"""Head-to-head ENCODER generalization probe (round-5 diagnosis of the
headtohead.json gap: reference delta +0.292 vs fdm_tpu +0.055 at 32 clips).

Both sides trained the same truncated HuBERT-large layout (2 transformer
layers, frozen conv extractor) jointly with their stage-2 diffusion on the
identical 32-clip universe. This probe runs BOTH trained encoders over the
same train/test audio, fits a ridge head features -> RMS envelope (the
task's sufficient statistic, fdm_tpu/data/synthetic.py:139-160) on TRAIN
frames, and scores R^2 on both splits. Whichever encoder keeps envelope
information on UNSEEN audio explains its side's test-split delta.

CPU-only. Usage:
    PYTHONPATH=/root/repo python -u runs_r5/headtohead/encoder_probe.py
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, "/root/repo")

import h2h_config as H  # noqa: E402

from fdm_tpu.cli.common import load_params  # noqa: E402
from fdm_tpu.data import synthetic_splits  # noqa: E402
from fdm_tpu.data.synthetic import frame_rms_envelope  # noqa: E402
from fdm_tpu.models.pipeline import LatentDiffusion  # noqa: E402

RIDGE = 1e-2


def fit_ridge(X, y):
    mu, sd = X.mean(0), X.std(0) + 1e-8
    Xc = (X - mu) / sd
    w = np.linalg.solve(
        Xc.T @ Xc + RIDGE * len(X) * np.eye(X.shape[1]), Xc.T @ (y - y.mean())
    )
    return mu, sd, w, y.mean()


def r2(model, X, y):
    mu, sd, w, b = model
    pred = ((X - mu) / sd) @ w + b
    return float(1.0 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum())


def splits_records(cfg):
    s = synthetic_splits(
        cfg, num_train=H.SIZE, num_eval=max(2, H.SIZE // 8),
        min_frames=40, max_frames=120, seed=H.SEED, with_audio=True,
        mode="correlated",
    )
    return s.train, s.test


def collect_jax(records, cfg, encode, params, bucket):
    sr, fps = cfg.dataset.audio_sr, cfg.dataset.fps
    feats, envs = [], []
    for rec in records:
        T = rec.motion.shape[0]
        wav = rec.audio
        pad = np.zeros(int(bucket / fps * sr), np.float32)
        pad[: len(wav)] = wav[: len(pad)]
        hidden = encode(params, jnp.asarray(pad[None]))
        feats.append(np.asarray(hidden[0][:T], np.float64))
        envs.append(frame_rms_envelope(wav, T, fps, sr).astype(np.float64))
    return np.concatenate(feats), np.concatenate(envs)


def collect_torch(records, cfg, audio_encoder):
    import torch

    sr, fps = cfg.dataset.audio_sr, cfg.dataset.fps
    feats, envs = [], []
    with torch.no_grad():
        for rec in records:
            T = rec.motion.shape[0]
            wav = rec.audio
            hidden = audio_encoder(
                torch.from_numpy(np.asarray(wav, np.float32))[None]
            ).last_hidden_state[0].numpy()  # (S50, 1024) ~50 Hz
            # linear interp 50 Hz features -> T motion frames (the same
            # alignment fdm_tpu's encode_audio applies)
            src = np.linspace(0.0, 1.0, num=hidden.shape[0])
            dst = np.linspace(0.0, 1.0, num=T)
            aligned = np.stack(
                [np.interp(dst, src, hidden[:, d]) for d in
                 range(hidden.shape[1])], axis=1)
            feats.append(aligned.astype(np.float64))
            envs.append(frame_rms_envelope(wav, T, fps, sr).astype(np.float64))
    return np.concatenate(feats), np.concatenate(envs)


def main():
    cfg = H.build_tpu_config()
    train, test = splits_records(cfg)
    print(f"clips: train {len(train)} test {len(test)}")
    out = {"size": H.SIZE, "ridge": RIDGE}

    # ---- fdm_tpu side ----
    pipe = LatentDiffusion.create(
        cfg, with_audio_encoder=True, allow_tiny_audio_encoder=True)
    bucket = 128

    @jax.jit
    def encode(params, wav):
        return pipe.encode_audio(params, wav, bucket)

    jp = load_params(os.path.join(H.TPU_DIR, "stage2",
                                  "mead_audio_params.msgpack"))
    Xtr, ytr = collect_jax(train, cfg, encode, jp, bucket)
    Xte, yte = collect_jax(test, cfg, encode, jp, bucket)
    m = fit_ridge(Xtr, ytr)
    out["fdm_tpu"] = {"train_r2": r2(m, Xtr, ytr), "test_r2": r2(m, Xte, yte)}
    print("fdm_tpu :", out["fdm_tpu"], flush=True)

    # ---- torch reference side ----
    import torch

    from ref_train import install_stubs, build_diffusion

    install_stubs()
    diffusion = build_diffusion()
    diffusion.load_state_dict(
        torch.load(os.path.join(H.REF_DIR, "stage2.pt"),
                   weights_only=False)["model"])
    diffusion.eval()
    enc = diffusion.denoise_fn.audio_encoder
    Xtr, ytr = collect_torch(train, cfg, enc)
    Xte, yte = collect_torch(test, cfg, enc)
    m = fit_ridge(Xtr, ytr)
    out["reference"] = {"train_r2": r2(m, Xtr, ytr),
                        "test_r2": r2(m, Xte, yte)}
    print("reference:", out["reference"], flush=True)

    with open(os.path.join(HERE, "encoder_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote encoder_probe.json")


if __name__ == "__main__":
    main()
