"""Audio encoders: parity vs HF transformers torch models (tiny random
configs, both layout variants), plus frame-rate alignment utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fdm_tpu.audio import AudioEncoder, pair_frames, linear_interpolate_frames
from fdm_tpu.audio.encoder import AudioEncoderConfig
from fdm_tpu.audio.convert import convert_hf_audio_encoder


def tiny_cfg(norm="group", stable=False, conv_bias=False):
    return AudioEncoderConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=48,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        conv_bias=conv_bias, feat_extract_norm=norm,
        do_stable_layer_norm=stable, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )


def hf_model_for(cfg, kind):
    if kind == "wav2vec2":
        from transformers import Wav2Vec2Config, Wav2Vec2Model

        hf_cfg = Wav2Vec2Config(
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            conv_dim=list(cfg.conv_dim),
            conv_kernel=list(cfg.conv_kernel),
            conv_stride=list(cfg.conv_stride),
            conv_bias=cfg.conv_bias,
            feat_extract_norm=cfg.feat_extract_norm,
            do_stable_layer_norm=cfg.do_stable_layer_norm,
            num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
            hidden_dropout=0.0, attention_dropout=0.0,
            feat_proj_dropout=0.0, layerdrop=0.0, apply_spec_augment=False,
        )
        return Wav2Vec2Model(hf_cfg).eval()
    else:
        from transformers import HubertConfig, HubertModel

        hf_cfg = HubertConfig(
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            conv_dim=list(cfg.conv_dim),
            conv_kernel=list(cfg.conv_kernel),
            conv_stride=list(cfg.conv_stride),
            conv_bias=cfg.conv_bias,
            feat_extract_norm=cfg.feat_extract_norm,
            do_stable_layer_norm=cfg.do_stable_layer_norm,
            num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
            hidden_dropout=0.0, attention_dropout=0.0,
            feat_proj_dropout=0.0, layerdrop=0.0, apply_spec_augment=False,
        )
        return HubertModel(hf_cfg).eval()


@pytest.mark.parametrize(
    "kind,norm,stable,conv_bias",
    [
        ("wav2vec2", "group", False, False),   # wav2vec2-base layout
        ("hubert", "layer", True, True),       # hubert-large layout
    ],
)
def test_audio_encoder_matches_hf(kind, norm, stable, conv_bias):
    torch.manual_seed(0)
    cfg = tiny_cfg(norm=norm, stable=stable, conv_bias=conv_bias)
    hf = hf_model_for(cfg, kind)

    wav = torch.randn(2, 800)
    with torch.no_grad():
        ref = hf(wav).last_hidden_state.numpy()

    params = convert_hf_audio_encoder(hf.state_dict(), cfg)
    ours = AudioEncoder(cfg).apply(
        params, jnp.asarray(wav.numpy()), even_trim=False
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_even_trim_matches_reference_wrapper():
    """Odd conv frame counts are trimmed to even before the transformer
    (reference models/hubert.py:95-96)."""
    cfg = tiny_cfg()
    hf = hf_model_for(cfg, "wav2vec2")
    params = convert_hf_audio_encoder(hf.state_dict(), cfg)
    model = AudioEncoder(cfg)
    # choose a length giving an odd conv output
    for samples in (790, 805, 820, 840):
        feats = model.apply(
            params, jnp.zeros((1, samples)), method="extract_features"
        )
        if feats.shape[1] % 2 == 1:
            out = model.apply(params, jnp.zeros((1, samples)))
            assert out.shape[1] == feats.shape[1] - 1
            return
    pytest.skip("no odd-length conv output found in probe range")


def test_pair_frames():
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    p = pair_frames(x, 2)
    assert p.shape == (2, 5, 6)
    np.testing.assert_array_equal(p[0, 0, :3], x[0, 0])
    np.testing.assert_array_equal(p[0, 0, 3:], x[0, 1])
    # odd length trims
    p2 = pair_frames(x[:, :9], 2)
    assert p2.shape == (2, 4, 6)


def test_linear_interpolation_matches_torch():
    torch.manual_seed(0)
    x = torch.randn(2, 50, 8)
    out_len = 30
    ref = torch.nn.functional.interpolate(
        x.transpose(1, 2), size=out_len, mode="linear", align_corners=True
    ).transpose(1, 2).numpy()
    ours = linear_interpolate_frames(
        jnp.asarray(x.numpy()), input_fps=50, output_fps=30, output_len=out_len
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_encoder_config_for_guards_tiny_substitution():
    """A full-size run with a mismatched audio_dim must fail loudly instead
    of silently training against a 2-layer stand-in encoder."""
    import pytest
    from fdm_tpu.audio.encoder import encoder_config_for
    from fdm_tpu.configs import get_config
    import dataclasses

    fdm = dataclasses.replace(get_config("mead").fdm, audio_dim=12)
    with pytest.raises(ValueError, match="allow_tiny"):
        encoder_config_for(fdm)
    tiny = encoder_config_for(fdm, allow_tiny=True)
    assert tiny.hidden_size == 12 and tiny.num_layers == 2
    # exact named match needs no flag
    full = encoder_config_for(get_config("mead").fdm)
    assert full.hidden_size == 1024 and full.num_layers == 24


def test_encoder_config_for_layer_truncation():
    """fdm.audio_layers truncates the named encoder's transformer depth
    while keeping its width, conv extractor, and layout (used to build
    matched-capacity audio stacks for convergence rehearsals)."""
    import dataclasses

    from fdm_tpu.audio.encoder import encoder_config_for
    from fdm_tpu.configs import get_config

    fdm = dataclasses.replace(get_config("mead").fdm, audio_layers=2)
    cfg = encoder_config_for(fdm)
    full = encoder_config_for(get_config("mead").fdm)
    assert cfg.num_layers == 2
    assert cfg.hidden_size == full.hidden_size == 1024
    assert cfg.conv_dim == full.conv_dim
    assert cfg.do_stable_layer_norm == full.do_stable_layer_norm


def test_audio_encoder_remat_matches_plain():
    """nn.remat'd encoder layers: identical hidden states and gradients
    (memory <- FLOPs trade only)."""
    cfg = tiny_cfg(norm="layer", stable=True, conv_bias=True)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 800)) * 0.1
    plain, remat = AudioEncoder(cfg), AudioEncoder(cfg, remat=True)
    params = plain.init(jax.random.PRNGKey(1), wav)

    def loss(model, p):
        return jnp.sum(model.apply(p, wav) ** 2)

    np.testing.assert_allclose(
        np.asarray(loss(plain, params)), np.asarray(loss(remat, params)),
        rtol=1e-6,
    )
    g1 = jax.grad(lambda p: loss(plain, p))(params)
    g2 = jax.grad(lambda p: loss(remat, p))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_training_mode_applies_dropout():
    """hidden_dropout/feat_proj_dropout are live in training mode (the HF
    reference regularizes fine-tuning): different keys give different
    outputs, and eval mode is unaffected by the config knob."""
    import dataclasses

    cfg = dataclasses.replace(
        tiny_cfg(), hidden_dropout=0.5, feat_proj_dropout=0.2
    )
    enc = AudioEncoder(cfg)
    wav = jax.random.normal(jax.random.PRNGKey(0), (1, 800)) * 0.1
    params = enc.init(jax.random.PRNGKey(1), wav)

    t1 = enc.apply(params, wav, specaugment_key=jax.random.PRNGKey(2))
    t2 = enc.apply(params, wav, specaugment_key=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)
    # same key -> bit-identical (deterministic training step)
    t1b = enc.apply(params, wav, specaugment_key=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1b))
    # eval is dropout-free regardless of the knob
    e1 = enc.apply(params, wav)
    e2 = enc.apply(params, wav)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_training_regularization_full_hf_set():
    """The HF checkpoints train with attention-probs dropout, FFN-activation
    dropout, and LayerDrop besides hidden dropout; each knob must be live
    in training mode on its own, and all must be dead in eval."""
    import dataclasses

    base = dataclasses.replace(
        tiny_cfg(), hidden_dropout=0.0, feat_proj_dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, layerdrop=0.0,
        apply_spec_augment=False,
    )
    wav = jax.random.normal(jax.random.PRNGKey(0), (1, 800)) * 0.1
    for knob in ("attention_dropout", "activation_dropout", "layerdrop"):
        cfg = dataclasses.replace(base, **{knob: 0.5})
        enc = AudioEncoder(cfg)
        params = enc.init(jax.random.PRNGKey(1), wav)
        t1 = enc.apply(params, wav, specaugment_key=jax.random.PRNGKey(2))
        t2 = enc.apply(params, wav, specaugment_key=jax.random.PRNGKey(5))
        assert not np.allclose(np.asarray(t1), np.asarray(t2), atol=1e-6), knob
        # eval path ignores the knob entirely
        e1 = enc.apply(params, wav)
        enc0 = AudioEncoder(base)
        e0 = enc0.apply(params, wav)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e0))
