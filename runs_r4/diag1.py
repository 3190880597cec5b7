"""Round-4 diagnostic: where does the r3corr2 full-size rehearsal lose the
audio->motion signal? Probes, all on CPU (keeps the TPU tunnel free):
  A. codec recon quality: L1 + temporal corr of recon vs GT vertices
  B. pre-quant latent -> envelope ridge R^2 (does the latent carry env?)
  C. post-quant latent -> envelope ridge R^2 (does quantization kill it?)
  D. trained audio-encoder features -> envelope ridge R^2 (vs random init)
"""
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from fdm_tpu.cli.common import (AudioFrontend, FlameDecoder, build_config,
                                load_params, load_splits, make_pipeline)
from fdm_tpu.data import collate_batch
from fdm_tpu.data.synthetic import frame_rms_envelope
from fdm_tpu.eval.correlation import temporal_corr

class A:
    dataset="mead"; tiny=False; synthetic=True; synthetic_mode="correlated"
    synthetic_size=64; seed=0; overrides=[]; data_root=None

cfg = build_config(A)
splits = load_splits(cfg, A)
recs = splits.test
flame = FlameDecoder(cfg)
ld = make_pipeline(cfg)
vq = load_params("checkpoints/r3corr2/stage1/mead_vqvae_params.msgpack")

def ridge_r2(X_list, y_list, alpha=1e-3):
    """leave-one-clip-out R^2 of ridge regression X->y."""
    r2s = []
    for k in range(len(X_list)):
        Xtr = np.concatenate([x for i, x in enumerate(X_list) if i != k])
        ytr = np.concatenate([y for i, y in enumerate(y_list) if i != k])
        mu, sd = Xtr.mean(0), Xtr.std(0) + 1e-8
        Xtr = (Xtr - mu) / sd
        w = np.linalg.solve(Xtr.T @ Xtr + alpha * len(Xtr) * np.eye(Xtr.shape[1]),
                            Xtr.T @ (ytr - ytr.mean()))
        Xte = (X_list[k] - mu) / sd
        pred = Xte @ w + ytr.mean()
        ss = ((y_list[k] - pred) ** 2).sum()
        tt = ((y_list[k] - y_list[k].mean()) ** 2).sum() + 1e-12
        r2s.append(1 - ss / tt)
    return float(np.mean(r2s))

lat_pre, lat_post, envs = [], [], []
print("== A: codec recon ==")
for r in recs:
    b = collate_batch([r], bucket=cfg.train.frame_bucket,
                      max_frames=cfg.train.max_frames, fps=cfg.dataset.fps,
                      include_audio=True)
    T = len(r.motion)
    verts = np.asarray(flame(jnp.asarray(b["motion"])))       # (1, Tp, V3)
    tmpl = np.asarray(flame(jnp.asarray(b["template"])))
    motion = jnp.asarray(verts - tmpl)
    emo = jnp.asarray(b["emotion_one_hot"])
    lat = ld.vqvae.apply(vq, motion, emo, None, method="encode")
    q = ld.vqvae.apply(vq, lat, emo, None, method="quant")
    rec_m = np.asarray(ld.vqvae.apply(vq, q.z_q, None, method="decode"))
    l1 = float(np.abs(rec_m[0, :T] - np.asarray(motion)[0, :T]).mean())
    tc = temporal_corr(rec_m[0, :T], np.asarray(motion)[0, :T])
    gt_std = float((np.asarray(motion)[0,:T] - np.asarray(motion)[0,:T].mean(0)).std(0).mean())
    print(f"{r.name}: T={T} recon_l1={l1:.5f} gt_temp_std={gt_std:.5f} recon_temporal_corr={tc:+.4f}")
    fq = cfg.vqvae.face_quan_num
    lat_pre.append(np.asarray(lat).reshape(-1, fq * cfg.vqvae.zquant_dim)[:T])
    lat_post.append(np.asarray(q.z_q).reshape(-1, fq * cfg.vqvae.zquant_dim)[:T])
    envs.append(frame_rms_envelope(r.audio, T, cfg.dataset.fps, cfg.dataset.audio_sr))

print("== B/C: latent->env ridge R2 (leave-one-clip-out) ==")
print("pre-quant :", ridge_r2(lat_pre, envs))
print("post-quant:", ridge_r2(lat_post, envs))

print("== D: audio features -> env ==")
for tag, path in [("trained", "checkpoints/r3corr2/stage2/mead_audio_params.msgpack"),
                  ("random", None)]:
    fe = AudioFrontend(cfg, path, seed=0, allow_tiny=True)
    feats = []
    for r, e in zip(recs, envs):
        T = len(r.motion)
        b = collate_batch([r], bucket=cfg.train.frame_bucket,
                          max_frames=cfg.train.max_frames,
                          fps=cfg.dataset.fps, include_audio=True)
        h = np.asarray(fe(b["audio"], b["motion"].shape[1]))[0, :T]
        feats.append(h)
    print(f"{tag}: audio_hidden->env R2 =", ridge_r2(feats, envs))
