"""Correlated synthetic data: the audio->motion map is deterministic and
recomputable, and the two-stage pipeline demonstrably LEARNS it.

The license-gated datasets (PARITY.md "Known gaps") block real-data quality
numbers; iid-noise synthetic runs validate plumbing but cannot show learning.
This mode closes that gap as far as an in-image test can: motion is a fixed
function of a speech-like audio envelope (fdm_tpu/data/synthetic.py), so a
trained model can be scored against the ground truth recomputed from its own
clip's audio vs the ground truth of a DIFFERENT clip's audio — a matched vs
mismatched control, the same design real audio-driven-animation evals use
(reference metric/metric.py compares per-clip predictions to per-clip GT)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fdm_tpu.configs import (
    DatasetConfig, DiffusionConfig, FDMConfig, PipelineConfig, TrainConfig,
    VQVAEConfig, biwi_config, mead_config,
)
from fdm_tpu.data import (
    envelope_to_motion, frame_rms_envelope, synthetic_splits,
)
from fdm_tpu.data.synthetic import _motion_basis, _speech_like_audio
from fdm_tpu.models import LatentDiffusion
from fdm_tpu.train import (
    create_train_state, default_optimizer, frozen_aware_optimizer,
    make_stage1_step, make_stage2_e2e_step,
)

# ---------------- generator invariants ----------------


def test_correlated_motion_recomputable_from_audio():
    """motion == envelope_to_motion(frame_rms_envelope(audio)) exactly — the
    property the matched/mismatched eval and the rehearsal GT rely on."""
    cfg = mead_config()
    splits = synthetic_splits(cfg, num_train=3, num_eval=1,
                              mode="correlated", seed=3)
    for rec in splits.train + splits.valid:
        env = frame_rms_envelope(
            rec.audio, rec.motion.shape[0], cfg.dataset.fps,
            cfg.dataset.audio_sr,
        )
        m = envelope_to_motion(
            env, rec.style_one_hot, rec.emotion_one_hot, cfg
        )
        np.testing.assert_array_equal(m, rec.motion)


def test_correlated_generator_deterministic_and_conditioned():
    cfg = biwi_config()
    a = synthetic_splits(cfg, num_train=4, num_eval=1,
                         mode="correlated", seed=0)
    b = synthetic_splits(cfg, num_train=4, num_eval=1,
                         mode="correlated", seed=0)
    np.testing.assert_array_equal(a.train[0].motion, b.train[0].motion)
    np.testing.assert_array_equal(a.train[0].audio, b.train[0].audio)

    # style changes the articulation direction: the same envelope under two
    # styles produces motion in (near-)orthogonal subspaces
    env = frame_rms_envelope(
        a.train[0].audio, a.train[0].motion.shape[0], cfg.dataset.fps,
        cfg.dataset.audio_sr,
    )
    s0 = np.eye(cfg.dataset.style_classes, dtype=np.float32)[0]
    s1 = np.eye(cfg.dataset.style_classes, dtype=np.float32)[1]
    m0 = envelope_to_motion(env, s0, None, cfg).ravel()
    m1 = envelope_to_motion(env, s1, None, cfg).ravel()
    cos = abs(np.dot(m0, m1)) / (np.linalg.norm(m0) * np.linalg.norm(m1))
    assert cos < 0.2, cos

    # no-audio request still derives motion from (unattached) audio
    na = synthetic_splits(cfg, num_train=2, num_eval=1, mode="correlated",
                          with_audio=False)
    assert na.train[0].audio is None


def test_with_audio_never_changes_the_records():
    """`with_audio` may only gate ATTACHMENT of the waveform, never the rng
    stream: when it gated the draw itself, read_audio=False CLIs
    (sample-vqvae) and read_audio=True CLIs (correlation) generated
    different records under the same names from record 1 on, and every
    stage-1 roundtrip gate scored predictions against another universe's
    ground truth (the round-4 rehearsal's false 'memorization' signal)."""
    for mode in ("correlated", "noise"):
        cfg = mead_config()
        wa = synthetic_splits(cfg, num_train=4, num_eval=2, mode=mode,
                              seed=0, with_audio=True)
        na = synthetic_splits(cfg, num_train=4, num_eval=2, mode=mode,
                              seed=0, with_audio=False)
        for a, b in zip(wa.train + wa.valid + wa.test,
                        na.train + na.valid + na.test):
            assert a.name == b.name
            np.testing.assert_array_equal(a.motion, b.motion)
            np.testing.assert_array_equal(a.template, b.template)
            np.testing.assert_array_equal(a.style_one_hot, b.style_one_hot)
            assert a.audio is not None and b.audio is None
    assert na.train[0].motion.std() > 0


def test_unknown_synthetic_mode_rejected():
    with pytest.raises(ValueError):
        synthetic_splits(mead_config(), mode="nonsense")


# ---------------- learning demonstration ----------------

_T, _FPS, _SR, _STYLES = 24, 30, 16000, 2


def _tiny_corr_config():
    return PipelineConfig(
        dataset=DatasetConfig(emotion_classes=0, style_classes=_STYLES,
                              vertex_count=10, fps=_FPS),
        vqvae=VQVAEConfig(
            in_dim=30, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=48, face_quan_num=4,
            zquant_dim=8, n_embed=64, emotion_classes=0,
        ),
        fdm=FDMConfig(
            feature_dim=32, n_head=4, num_layers=1, audio_dim=12,
            audio_pair_factor=2, tokens_per_frame=4, emotion_classes=0,
            style_classes=_STYLES, num_timesteps=20, max_seq_len=40,
        ),
        diffusion=DiffusionConfig(timesteps=20, sample_steps=20,
                                  ddim_steps=4),
        train=TrainConfig(),
    )


def _clip(cfg, rng, style_idx):
    wav = _speech_like_audio(rng, _T, _FPS, _SR)
    env = frame_rms_envelope(wav, _T, _FPS, _SR)
    style = np.eye(_STYLES, dtype=np.float32)[style_idx]
    return wav, env, style, envelope_to_motion(env, style, None, cfg)


def test_pipeline_learns_audio_to_motion_map():
    """Train both stages on 8 correlated clips, then generate from HELD-OUT
    audio: the output must track its own clip's envelope (and ground truth)
    far better than another clip's — i.e. the system learned audio->motion,
    not just shapes. Slow (~1.5 min CPU) but it is the only in-image
    evidence of end-to-end learning. All seeds fixed: deterministic."""
    cfg = _tiny_corr_config()
    rng = np.random.RandomState(0)
    N = 8
    clips = [_clip(cfg, rng, i % _STYLES) for i in range(N)]
    wavs = jnp.array(np.stack([c[0] for c in clips]))
    styles = jnp.array(np.stack([c[2] for c in clips]))
    motions = jnp.array(np.stack([c[3] for c in clips]))
    template = jnp.zeros((N, 1, 30))

    ld = LatentDiffusion.create(
        cfg, with_audio_encoder=True, allow_tiny_audio_encoder=True
    )

    # stage 1: the codec must make the envelope-driven motion compressible
    vq_params = ld.vqvae.init(jax.random.PRNGKey(2), motions, template, None)
    tx1 = default_optimizer(3e-3)
    s1 = create_train_state(vq_params, tx1)
    step1 = make_stage1_step(ld, tx1)
    b1 = {"motion": motions, "template": template, "emotion_one_hot": None}
    for _ in range(2000):
        s1, m1 = step1(s1, b1)
    vq_params = s1.params
    rec = ld.vqvae.apply(vq_params, motions, template, None)[0]
    rel = float(jnp.linalg.norm(rec - motions) / jnp.linalg.norm(motions))
    assert rel < 0.5, f"codec failed to learn structured motion: rel {rel}"

    # stage 2: joint FDM + tiny-audio-encoder training (reference Q10 regime)
    audio_params = ld.audio_encoder.init(jax.random.PRNGKey(3), wavs)
    hidden = ld.encode_audio(audio_params, wavs, _T)
    L = _T * cfg.fdm.tokens_per_frame
    C = cfg.fdm.feature_dim // cfg.fdm.tokens_per_frame
    fdm_params = ld.fdm.init(
        jax.random.PRNGKey(4), jnp.zeros((N, L, C)),
        jnp.zeros((N,), jnp.int32), hidden, styles, None,
    )
    params = {"fdm": fdm_params, "audio": audio_params}
    tx2 = frozen_aware_optimizer(optax.adam(2e-3), params)
    s2 = create_train_state(params, tx2)
    step2 = make_stage2_e2e_step(ld, tx2, vq_params, donate=False)
    batch = {"motion": motions, "template": template, "audio": wavs,
             "style_one_hot": styles, "emotion_one_hot": None}
    key = jax.random.PRNGKey(7)
    first_loss = None
    for _ in range(2000):
        key, sub = jax.random.split(key)
        s2, m2 = step2(s2, batch, sub)
        if first_loss is None:
            first_loss = float(m2["denoise_loss"])
    last_loss = float(m2["denoise_loss"])
    assert last_loss < first_loss * 0.5, (first_loss, last_loss)

    # held-out eval: matched vs mismatched audio
    test_rng = np.random.RandomState(99)
    primary, _, _ = _motion_basis(30, _STYLES, 0, False)
    style0 = np.eye(_STYLES, dtype=np.float32)[0]
    R = 4  # average R generations (iid noise per batch element)
    corr_matched, corr_ctrl, mse_wins = [], [], 0
    for trial in range(3):
        wav = _speech_like_audio(test_rng, _T, _FPS, _SR)
        env = frame_rms_envelope(wav, _T, _FPS, _SR)
        hidden = ld.encode_audio(s2.params["audio"], jnp.array(wav)[None], _T)
        out = ld.generate(
            vq_params, s2.params["fdm"], jax.random.PRNGKey(100 + trial),
            jnp.tile(hidden, (R, 1, 1)), jnp.zeros((R, 1, 30)),
            jnp.tile(jnp.array(style0)[None], (R, 1)), None, sampler="ddpm",
        )
        mean_out = np.asarray(out).mean(axis=0)
        proj = mean_out @ primary[0] / np.sum(primary[0] ** 2)
        corr_matched.append(np.corrcoef(proj, env)[0, 1])
        ctrl_rng = np.random.RandomState(1234 + trial)
        envs_ctrl = [
            frame_rms_envelope(
                _speech_like_audio(ctrl_rng, _T, _FPS, _SR), _T, _FPS, _SR
            )
            for _ in range(6)
        ]
        corr_ctrl.extend(np.corrcoef(proj, e)[0, 1] for e in envs_ctrl)
        gt = envelope_to_motion(env, style0, None, cfg)
        gt_ctrl = envelope_to_motion(envs_ctrl[-1], style0, None, cfg)
        if np.mean((mean_out - gt) ** 2) < np.mean((mean_out - gt_ctrl) ** 2):
            mse_wins += 1

    cm, cc = float(np.mean(corr_matched)), float(np.mean(corr_ctrl))
    assert cm > 0.4, (corr_matched, corr_ctrl)
    assert cm - cc > 0.3, (corr_matched, corr_ctrl)
    assert mse_wins >= 2, mse_wins
