"""SpecAugment mask generator + wiring tests.

Parity target: reference models/wav2vec.py:11-58 (_compute_mask_indices) and
its application at models/hubert.py:112-130. The JAX generator is
distribution-equivalent (static shapes inside jit); span expansion is
pinned-input identical to the reference's offset expansion.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_oracle import import_reference_module

from fdm_tpu.audio.specaugment import (
    SpecAugmentConfig,
    compute_mask_indices,
    expand_spans,
    sample_masks,
)


def _ref_generator():
    return import_reference_module("models.wav2vec")._compute_mask_indices


def test_expand_spans_matches_reference_expansion_pinned_starts():
    """Same pinned span starts -> byte-identical mask vs the reference's
    offset expansion (wav2vec.py:50-51), including the tail filter."""
    sz, L = 40, 7
    starts = np.array([[0, 12, 30], [5, 20, 33]])  # 33+6=39 < 40: in range
    ref = np.full((2, sz), False)
    for i in range(2):
        idc = np.asarray(
            [s + off for s in starts[i] for off in range(L)]
        )
        ref[i, np.unique(idc[idc < sz])] = True
    got = np.asarray(
        expand_spans(jnp.asarray(starts, jnp.int32), jnp.int32(3), sz, L)
    )
    np.testing.assert_array_equal(got, ref)


def test_expand_spans_filters_out_of_range_tail():
    sz, L = 20, 10
    starts = np.array([[15, 2]])  # 15..24 clipped to 15..19
    got = np.asarray(
        expand_spans(jnp.asarray(starts, jnp.int32), jnp.int32(2), sz, L)
    )
    expect = np.zeros((1, sz), bool)
    expect[0, 2:12] = True
    expect[0, 15:20] = True
    np.testing.assert_array_equal(got, expect)
    # num_active=1 drops the second span entirely
    got1 = np.asarray(
        expand_spans(jnp.asarray(starts, jnp.int32), jnp.int32(1), sz, L)
    )
    expect1 = np.zeros((1, sz), bool)
    expect1[0, 15:20] = True
    np.testing.assert_array_equal(got1, expect1)


def test_mask_rate_distribution_matches_torch_generator():
    """Statistical parity: mean masked fraction and per-row equalization
    match the reference numpy generator over many draws."""
    ref_fn = _ref_generator()
    B, N, p, L = 8, 249, 0.05, 10
    jf, rf = [], []
    for i in range(40):
        m = np.asarray(
            compute_mask_indices(jax.random.PRNGKey(i), (B, N), p, L,
                                 min_masks=2)
        )
        # reference equalizes every row to the batch-min count
        assert len(set(m.sum(-1).tolist())) == 1
        jf.append(m.mean())
    np.random.seed(0)
    for _ in range(40):
        rf.append(ref_fn((B, N), p, L, min_masks=2).mean())
    assert abs(np.mean(jf) - np.mean(rf)) < 0.01, (np.mean(jf), np.mean(rf))


def test_min_masks_floor_and_span_structure():
    B, N, L = 4, 60, 5
    # p tiny -> num_mask would be 0; min_masks=2 forces 2 spans
    m = np.asarray(
        compute_mask_indices(jax.random.PRNGKey(3), (B, N), 1e-6, L,
                             min_masks=2)
    )
    counts = m.sum(-1)
    assert (counts >= 1).all() and (counts <= 2 * L).all()
    # every masked run is a union of length-5 spans: runs are >= 1 and the
    # total is the equalized batch-min
    assert len(set(counts.tolist())) == 1


def test_sample_masks_tiny_sequences_skip_masking():
    cfg = SpecAugmentConfig()
    tm, fm = sample_masks(jax.random.PRNGKey(0), 2, 8, 16, cfg)
    assert tm is None          # seq_len 8 <= mask_time_length 10
    assert fm is None          # feature prob 0


def test_encoder_applies_time_mask_and_masked_spec_embed_exists():
    from fdm_tpu.audio.encoder import AudioEncoder, AudioEncoderConfig

    cfg = AudioEncoderConfig(
        hidden_size=24, num_layers=1, num_heads=4, intermediate_size=32,
        conv_dim=(24,) * 3, conv_kernel=(10, 8, 4), conv_stride=(5, 8, 4),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=1,
        mask_time_length=4,
    )
    enc = AudioEncoder(cfg)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 16000))
    params = jax.jit(enc.init)(jax.random.PRNGKey(1), wav)
    assert params["params"]["masked_spec_embed"].shape == (24,)

    eval_out = enc.apply(params, wav)
    train_out = enc.apply(
        params, wav, specaugment_key=jax.random.PRNGKey(2)
    )
    assert eval_out.shape == train_out.shape
    # masking must change the output
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
    # and be deterministic in the key
    train_out2 = enc.apply(
        params, wav, specaugment_key=jax.random.PRNGKey(2)
    )
    np.testing.assert_allclose(
        np.asarray(train_out), np.asarray(train_out2)
    )


def test_stage2_e2e_loss_uses_specaugment():
    """The training loss must differ from a no-mask forward under the same
    key wiring (reference's self.training branch is on by default)."""
    from fdm_tpu.configs import (
        DatasetConfig, DiffusionConfig, FDMConfig, PipelineConfig,
        TrainConfig, VQVAEConfig,
    )
    from fdm_tpu.models import LatentDiffusion
    import dataclasses as dc

    cfg = PipelineConfig(
        dataset=DatasetConfig(emotion_classes=7, style_classes=5),
        vqvae=VQVAEConfig(
            in_dim=30, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=48, face_quan_num=4,
            zquant_dim=8, n_embed=28, emotion_classes=7,
        ),
        fdm=FDMConfig(
            feature_dim=32, n_head=4, num_layers=1, audio_dim=12,
            audio_pair_factor=2, tokens_per_frame=4, emotion_classes=7,
            style_classes=5, num_timesteps=20, max_seq_len=40,
            cfg_mask_prob=0.0,
        ),
        diffusion=DiffusionConfig(timesteps=20, sample_steps=20,
                                  ddim_steps=4),
        train=TrainConfig(),
    )
    ld = LatentDiffusion.create(
        cfg, with_audio_encoder=True, allow_tiny_audio_encoder=True
    )
    # the tiny stand-in encoder defaults to apply_spec_augment=True with
    # mask_time_length=10; its conv stack yields 50 frames/s so T=32 works
    B, T = 2, 32
    motion = jax.random.normal(jax.random.PRNGKey(0), (B, T, 30)) * 0.1
    template = jnp.zeros((B, 1, 30))
    wav = jax.random.normal(jax.random.PRNGKey(1),
                            (B, int(T / 25 * 16000))) * 0.1
    style = jnp.eye(5)[jnp.arange(B) % 5]
    emo = jnp.eye(7)[jnp.arange(B) % 7]
    vq_params = ld.vqvae.init(jax.random.PRNGKey(2), motion, template, emo)
    audio_params = ld.audio_encoder.init(jax.random.PRNGKey(3), wav)
    hidden = ld.encode_audio(audio_params, wav, T)
    L = T * cfg.fdm.tokens_per_frame
    C = cfg.fdm.feature_dim // cfg.fdm.tokens_per_frame
    fdm_params = ld.fdm.init(
        jax.random.PRNGKey(4), jnp.zeros((B, L, C)),
        jnp.zeros((B,), jnp.int32), hidden, style, emo,
    )
    params = {"fdm": fdm_params, "audio": audio_params}

    # the loss VALUE at init is insensitive to audio (zero-init FDM head,
    # CLAUDE.md note 6), so assert the wiring: e2e must call encode_audio
    # with a SpecAugment key, and that key must change the hidden states
    seen = {}
    orig = LatentDiffusion.encode_audio

    def spy(self, audio_params, w, n, specaugment_key=None, **kw):
        seen["key"] = specaugment_key
        return orig(self, audio_params, w, n,
                    specaugment_key=specaugment_key, **kw)

    key = jax.random.PRNGKey(7)
    try:
        LatentDiffusion.encode_audio = spy
        loss_masked, _ = ld.stage2_train_loss_e2e(
            vq_params, params, key, motion, template, wav, style, emo
        )
    finally:
        LatentDiffusion.encode_audio = orig
    assert np.isfinite(float(loss_masked))
    assert seen["key"] is not None

    hidden_masked = ld.encode_audio(
        params["audio"], wav, T, specaugment_key=seen["key"]
    )
    hidden_nomask = ld.encode_audio(params["audio"], wav, T)
    assert not np.allclose(
        np.asarray(hidden_masked), np.asarray(hidden_nomask)
    )
