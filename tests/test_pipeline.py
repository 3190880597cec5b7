"""End-to-end pipeline: training losses and audio->vertices generation on a
tiny config (synthetic weights)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdm_tpu.configs import (
    DatasetConfig, DiffusionConfig, FDMConfig, PipelineConfig, TrainConfig,
    VQVAEConfig,
)
from fdm_tpu.models import LatentDiffusion


def tiny_pipeline(emotion=True):
    emotion_classes = 7 if emotion else 0
    vq = VQVAEConfig(
        in_dim=30, hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=48, face_quan_num=4, zquant_dim=8,
        n_embed=7 * 4 if emotion else 16, emotion_classes=emotion_classes,
    )
    fdm = FDMConfig(
        feature_dim=32, n_head=4, num_layers=1, audio_dim=12,
        audio_pair_factor=2, tokens_per_frame=4,
        emotion_classes=emotion_classes, style_classes=5,
        num_timesteps=20, max_seq_len=40,
    )
    return PipelineConfig(
        dataset=DatasetConfig(emotion_classes=emotion_classes, style_classes=5),
        vqvae=vq, fdm=fdm,
        diffusion=DiffusionConfig(timesteps=20, sample_steps=20, ddim_steps=4),
        train=TrainConfig(),
    )


def init_pipeline(cfg):
    ld = LatentDiffusion.create(cfg)
    B, T = 2, 8
    motion = jax.random.normal(jax.random.PRNGKey(0), (B, T, cfg.vqvae.in_dim))
    template = jnp.zeros((B, 1, cfg.vqvae.in_dim))
    emo = jnp.eye(7)[:B] if cfg.vqvae.emotion_classes else None
    style = jnp.eye(5)[:B]
    audio = jax.random.normal(
        jax.random.PRNGKey(1),
        (B, T, cfg.fdm.audio_dim * cfg.fdm.audio_pair_factor),
    )
    vq_params = ld.vqvae.init(jax.random.PRNGKey(2), motion, template, emo)
    L = T * cfg.fdm.tokens_per_frame
    C = cfg.fdm.feature_dim // cfg.fdm.tokens_per_frame
    fdm_params = ld.fdm.init(
        jax.random.PRNGKey(3), jnp.zeros((B, L, C)),
        jnp.zeros((B,), jnp.int32), audio, style, emo,
    )
    return ld, vq_params, fdm_params, motion, template, audio, style, emo


def test_stage1_loss_runs_and_differentiates():
    cfg = tiny_pipeline()
    ld, vq_params, _, motion, template, _, _, emo = init_pipeline(cfg)

    def loss_fn(p):
        return ld.stage1_train_loss(p, motion, template, emo)[0]

    loss, grads = jax.value_and_grad(loss_fn)(vq_params)
    assert np.isfinite(loss)
    gnorm = sum(
        jnp.abs(g).sum() for g in jax.tree_util.tree_leaves(grads)
    )
    assert gnorm > 0


def test_stage2_loss_freezes_vq_and_trains_fdm():
    cfg = tiny_pipeline()
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    key = jax.random.PRNGKey(0)

    def loss_fn(fp, vp):
        return ld.stage2_train_loss(
            vp, fp, key, motion, template, audio, style, emo
        )[0]

    loss, fdm_grads = jax.value_and_grad(loss_fn)(fdm_params, vq_params)
    assert np.isfinite(loss)
    g_fdm = sum(jnp.abs(g).sum() for g in jax.tree_util.tree_leaves(fdm_grads))
    assert g_fdm > 0
    # the VQ codec is frozen: gradient w.r.t. vq params is identically zero
    vq_grads = jax.grad(lambda vp: loss_fn(fdm_params, vp))(vq_params)
    g_vq = sum(jnp.abs(g).sum() for g in jax.tree_util.tree_leaves(vq_grads))
    assert g_vq == 0


def test_stage2_loss_masks_padding():
    cfg = tiny_pipeline()
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    key = jax.random.PRNGKey(7)
    mask = jnp.ones((2, 8)).at[:, 6:].set(0.0)
    _, metrics = ld.stage2_train_loss(
        vq_params, fdm_params, key, motion, template, audio, style, emo,
        frame_mask=mask,
    )
    assert np.isfinite(metrics["loss"])


@pytest.mark.parametrize("sampler", ["ddpm", "ddim"])
def test_generate_produces_vertices(sampler):
    cfg = tiny_pipeline()
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    gen = jax.jit(
        lambda k: ld.generate(
            vq_params, fdm_params, k, audio, template, style, emo,
            sampler=sampler,
        )
    )
    out = gen(jax.random.PRNGKey(0))
    assert out.shape == motion.shape
    assert jnp.isfinite(out).all()


def test_generate_with_cfg_scale():
    cfg = tiny_pipeline()
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    out = jax.jit(
        lambda k: ld.generate(
            vq_params, fdm_params, k, audio, template, style, emo,
            sampler="ddim", cfg_scale=2.5,
        )
    )(jax.random.PRNGKey(0))
    assert out.shape == motion.shape
    assert jnp.isfinite(out).all()


def test_traced_cfg_scale_matches_static():
    """cfg_scale may be passed as a TRACED jit argument (the serving front
    end does, so client-chosen guidance strengths share one compiled
    program). The perturbed head makes cond != uncond, so the traced
    multiplier must reproduce the static-float path bit-exactly and two
    scales must genuinely differ."""
    cfg = tiny_pipeline()
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    # zero-init output head would make guidance a no-op; perturb every leaf
    fdm_params = jax.tree.map(
        lambda a: a + 0.01 * jnp.ones_like(a), fdm_params
    )

    static = jax.jit(
        lambda k: ld.generate(
            vq_params, fdm_params, k, audio, template, style, emo,
            sampler="ddim", cfg_scale=2.5,
        )
    )(jax.random.PRNGKey(0))
    traced_fn = jax.jit(
        lambda k, s: ld.generate(
            vq_params, fdm_params, k, audio, template, style, emo,
            sampler="ddim", cfg_scale=s,
        )
    )
    traced = traced_fn(jax.random.PRNGKey(0), jnp.float32(2.5))
    np.testing.assert_array_equal(np.asarray(static), np.asarray(traced))
    other = traced_fn(jax.random.PRNGKey(0), jnp.float32(1.0))
    assert not np.allclose(np.asarray(traced), np.asarray(other))


def test_generate_no_emotion_variant():
    cfg = tiny_pipeline(emotion=False)
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    assert emo is None
    out = ld.generate(
        vq_params, fdm_params, jax.random.PRNGKey(0), audio, template, style,
        sampler="ddim",
    )
    assert out.shape == motion.shape


def test_generate_is_deterministic_given_key():
    """Same key, params, and inputs -> bit-identical generations (serving
    reproducibility; the torch original's sampler draws from global RNG
    state and cannot replay)."""
    cfg = tiny_pipeline()
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    key = jax.random.PRNGKey(11)
    run = jax.jit(
        lambda k: ld.generate(
            vq_params, fdm_params, k, audio, template, style, emo,
            sampler="ddim", num_steps=4,
        )
    )
    a, b = run(key), run(key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = run(jax.random.PRNGKey(12))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_timestep_config_drift_raises():
    """fdm.num_timesteps drifting from diffusion.timesteps would silently
    zero the timestep one-hot for t >= num_timesteps — create() refuses."""
    cfg = tiny_pipeline()
    bad = dataclasses.replace(
        cfg, diffusion=dataclasses.replace(cfg.diffusion, timesteps=40)
    )
    with pytest.raises(ValueError, match="num_timesteps"):
        LatentDiffusion.create(bad)


def test_generate_rejects_quant_factor():
    """generate()'s latent_shape assumes one latent frame per audio frame;
    a quant_factor > 0 codec must be refused loudly, not desync silently."""
    cfg = tiny_pipeline()
    qf = dataclasses.replace(
        cfg, vqvae=dataclasses.replace(cfg.vqvae, quant_factor=1)
    )
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    ld_qf = dataclasses.replace(ld, config=qf)
    with pytest.raises(NotImplementedError, match="quant_factor"):
        ld_qf.generate(
            vq_params, fdm_params, jax.random.PRNGKey(0), audio,
            template, style, emo, sampler="ddim", num_steps=2,
        )
