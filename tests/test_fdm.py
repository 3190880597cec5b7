"""FDM denoiser: mask parity vs the reference, full-stack parity vs a torch
replica assembled from torch primitives (nn.TransformerDecoder etc.), and the
fast aligned-cross-attention path vs the full masked path."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn_t

from fdm_tpu.configs import FDMConfig
from fdm_tpu.models import FDM
from fdm_tpu.ops.masks import alibi_biased_mask, enc_dec_diagonal_allowed
from fdm_tpu.ops.positional import periodic_positional_encoding, sinusoidal_table
from fdm_tpu.utils.torch_import import convert_fdm

from reference_oracle import import_reference_module


def test_alibi_mask_matches_reference():
    ref = import_reference_module("models.fdm_vqvae_mead")
    for n_head, period in [(4, 30), (8, 30), (4, 25), (6, 30)]:
        ref_mask = ref.init_biased_mask(
            n_head=n_head, max_seq_len=60, period=period
        ).numpy()
        ours = alibi_biased_mask(n_head, 60, period)
        np.testing.assert_allclose(ours, ref_mask, rtol=1e-6)


def test_enc_dec_mask_matches_reference():
    ref = import_reference_module("models.fdm_vqvae_mead")
    t_mask = ref.enc_dec_mask(torch.device("cpu"), "BIWI", 7, 7).numpy()
    ours_allowed = enc_dec_diagonal_allowed(7, 7)
    # reference True = masked; ours True = allowed
    np.testing.assert_array_equal(ours_allowed, ~t_mask)


class TorchFDMReplica(nn_t.Module):
    """Independent torch assembly of the MEAD denoiser math
    (mirrors reference fdm_vqvae_mead.py:65-104 behavior, audio encoder
    excluded — it receives precomputed hidden states)."""

    def __init__(self, cfg: FDMConfig, alibi, torch_pe):
        super().__init__()
        D = cfg.feature_dim
        self.cfg = cfg
        self.audio_extract = nn_t.Sequential(
            nn_t.Linear(cfg.audio_dim * cfg.audio_pair_factor, D),
            nn_t.Mish(),
            nn_t.Linear(D, D),
        )
        self.time_embedd = nn_t.Sequential(
            nn_t.Linear(cfg.num_timesteps, D), nn_t.Mish()
        )
        self.emotion_embedd = nn_t.Linear(cfg.emotion_classes, D)
        self.style_embedd = nn_t.Linear(cfg.style_classes, D)
        self.latent_encoder = nn_t.Sequential(nn_t.Linear(D, D), nn_t.Mish())
        layer = nn_t.TransformerDecoderLayer(
            d_model=D, nhead=cfg.n_head, dim_feedforward=2 * D, batch_first=True
        )
        self.decoder = nn_t.TransformerDecoder(layer, num_layers=cfg.num_layers)
        self.latent_decoder = nn_t.Linear(D, D)
        self.alibi = alibi
        self.pe = torch_pe

    def forward(self, x_t, t, audio_hidden, emo, style):
        cfg = self.cfg
        B, L, C = x_t.shape
        tpf = cfg.tokens_per_frame
        x = x_t.reshape(B, L // tpf, tpf * C)
        T = x.shape[1]
        audio = audio_hidden.reshape(
            B, audio_hidden.shape[1] // cfg.audio_pair_factor,
            audio_hidden.shape[2] * cfg.audio_pair_factor,
        )[:, :T]
        af = self.audio_extract(audio)
        vf = self.latent_encoder(x)
        one_hot_t = torch.zeros(B, cfg.num_timesteps)
        one_hot_t[torch.arange(B), t] = 1.0
        time = self.time_embedd(one_hot_t)
        vf = vf + self.style_embedd(style)[:, None] + self.emotion_embedd(emo)[:, None]
        af = af + time[:, None]
        vf = vf + self.pe[:T][None]
        tgt_mask = self.alibi[:, :T, :T]
        mem_mask = torch.from_numpy(~enc_dec_diagonal_allowed(T, T))
        out = self.decoder(vf, af, tgt_mask=tgt_mask, memory_mask=mem_mask)
        out = self.latent_decoder(out)
        return out.reshape(B, L, C)


def small_cfg():
    return FDMConfig(
        feature_dim=32, n_head=4, num_layers=2, audio_dim=24,
        audio_pair_factor=2, tokens_per_frame=4, emotion_classes=7,
        style_classes=5, num_timesteps=50, max_seq_len=40, alibi_period=30,
    )


def replica_state_dict_to_ours(replica, cfg):
    sd = {k: v for k, v in replica.state_dict().items()}
    # map replica names onto the reference names convert_fdm expects
    renamed = {}
    for k, v in sd.items():
        k2 = (
            k.replace("decoder.layers.", "transformer_decoder.layers.")
        )
        renamed[k2] = v
    renamed["latent_encoder.0.weight"] = renamed.pop("latent_encoder.0.weight")
    return convert_fdm(renamed, cfg)


def test_fdm_matches_torch_replica_full_and_fast():
    torch.manual_seed(0)
    cfg = small_cfg()
    alibi = torch.from_numpy(
        alibi_biased_mask(cfg.n_head, cfg.max_seq_len, cfg.alibi_period)
    )
    pe = torch.from_numpy(sinusoidal_table(cfg.max_seq_len, cfg.feature_dim))
    replica = TorchFDMReplica(cfg, alibi, pe).eval()

    B, T = 1, 10
    L = T * cfg.tokens_per_frame
    C = cfg.feature_dim // cfg.tokens_per_frame
    x_t = torch.randn(B, L, C)
    audio_hidden = torch.randn(B, T * cfg.audio_pair_factor, cfg.audio_dim)
    emo = torch.zeros(B, 7); emo[0, 2] = 1
    style = torch.zeros(B, 5); style[0, 1] = 1
    t_step = torch.tensor([7])

    with torch.no_grad():
        ref_out = replica(x_t, t_step, audio_hidden, emo, style).numpy()

    params = replica_state_dict_to_ours(replica, cfg)
    # our model consumes audio already paired to frame-major layout
    audio_paired = jnp.asarray(
        audio_hidden.reshape(B, T, cfg.audio_dim * cfg.audio_pair_factor).numpy()
    )

    for mode in ["full", "fast"]:
        model = FDM(cfg, cross_mode=mode)
        out = model.apply(
            params,
            jnp.asarray(x_t.numpy()),
            jnp.asarray(t_step.numpy()),
            audio_paired,
            jnp.asarray(style.numpy()),
            jnp.asarray(emo.numpy()),
        )
        np.testing.assert_allclose(
            np.asarray(out), ref_out, rtol=1e-3, atol=2e-4,
            err_msg=f"cross_mode={mode}",
        )


def test_prepare_audio_hoisting_equivalence():
    """denoise(prepare_audio(a)) == __call__(a) — the hoisted path is exact."""
    cfg = small_cfg()
    model = FDM(cfg)
    B, T = 2, 6
    L = T * cfg.tokens_per_frame
    C = cfg.feature_dim // cfg.tokens_per_frame
    x_t = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (B, T, cfg.audio_dim * cfg.audio_pair_factor)
    )
    style = jnp.eye(5)[:B]
    emo = jnp.eye(7)[:B]
    t = jnp.array([3, 11], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(2), x_t, t, audio, style, emo)

    direct = model.apply(params, x_t, t, audio, style, emo)
    feat = model.apply(params, audio, method="prepare_audio")
    hoisted = model.apply(params, x_t, t, feat, style, emo, method="denoise")
    np.testing.assert_allclose(direct, hoisted, rtol=1e-6)


def test_zero_init_output_head():
    """latent_decoder is zero-initialized like the reference
    (fdm_vqvae_mead.py:50-52): a fresh FDM predicts exactly zero."""
    cfg = small_cfg()
    model = FDM(cfg)
    B, T = 1, 4
    L, C = T * cfg.tokens_per_frame, cfg.feature_dim // cfg.tokens_per_frame
    x_t = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    audio = jnp.ones((B, T, cfg.audio_dim * cfg.audio_pair_factor))
    style = jnp.eye(5)[:1]
    emo = jnp.eye(7)[:1]
    t = jnp.array([0], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x_t, t, audio, style, emo)
    out = model.apply(params, x_t, t, audio, style, emo)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_pe_dropout_active_in_training_mode():
    """The reference's PositionalEncoding ends with nn.Dropout(0.1) on the
    PE-added features, live in forward (fdm_vqvae_mead.py:97,203) — our
    denoise_embed must drop in train mode and be exact in eval mode."""
    cfg = small_cfg()
    model = FDM(cfg)
    B, T = 2, 4
    L, C = T * cfg.tokens_per_frame, cfg.feature_dim // cfg.tokens_per_frame
    x_t = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    audio = jnp.ones((B, T, cfg.audio_dim * cfg.audio_pair_factor))
    style = jnp.eye(5)[:B]
    emo = jnp.eye(7)[:B]
    t = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x_t, t, audio, style, emo)
    audio_feat = model.apply(params, audio, method="prepare_audio")

    def embed(deterministic, seed):
        x, _ = model.apply(
            params, x_t, t, audio_feat, style, emo, deterministic,
            method="denoise_embed",
            rngs={"dropout": jax.random.PRNGKey(seed)},
        )
        return np.asarray(x)

    eval_a, eval_b = embed(True, 0), embed(True, 1)
    np.testing.assert_array_equal(eval_a, eval_b)  # eval: no dropout

    train_a, train_b = embed(False, 0), embed(False, 1)
    assert np.abs(train_a - train_b).max() > 0          # key-dependent
    assert np.abs(train_a - eval_a).max() > 0           # differs from eval
    # inverted dropout: surviving entries are eval / (1 - p), dropped are 0
    p = cfg.dropout
    kept = np.abs(train_a) > 1e-12
    np.testing.assert_allclose(
        train_a[kept], eval_a[kept] / (1.0 - p), rtol=1e-5
    )
    frac_dropped = 1.0 - kept.mean()
    assert 0.02 < frac_dropped < 0.3   # ~p of entries zeroed


def test_audio_frame_mismatch_raises():
    cfg = small_cfg()
    model = FDM(cfg)
    B, T = 1, 4
    L, C = T * cfg.tokens_per_frame, cfg.feature_dim // cfg.tokens_per_frame
    x_t = jnp.zeros((B, L, C))
    audio = jnp.zeros((B, T + 1, cfg.audio_dim * cfg.audio_pair_factor))
    style = jnp.eye(5)[:1]
    emo = jnp.eye(7)[:1]
    t = jnp.array([0], dtype=jnp.int32)
    try:
        model.init(jax.random.PRNGKey(0), x_t, t, audio, style, emo)
        raised = False
    except ValueError as e:
        raised = "must match latent" in str(e)
    assert raised


def test_fdm_biwi_variant_matches_torch_replica():
    """BIWI flavor: style embed wrapped in Mish, bare latent encoder
    (reference models/fdm.py:34-38)."""
    torch.manual_seed(1)
    cfg = FDMConfig(
        feature_dim=32, n_head=4, num_layers=2, audio_dim=24,
        audio_pair_factor=2, tokens_per_frame=4, emotion_classes=0,
        style_classes=6, num_timesteps=50, max_seq_len=40, alibi_period=25,
        style_mish=True, latent_encoder_mish=False, dropout=0.0,
    )
    alibi = torch.from_numpy(alibi_biased_mask(4, 40, 25))
    pe = torch.from_numpy(
        np.asarray(sinusoidal_table(cfg.max_seq_len, cfg.feature_dim))
    ).float()

    class BiwiReplica(TorchFDMReplica):
        def __init__(self):
            super().__init__(
                FDMConfig(
                    feature_dim=32, n_head=4, num_layers=2, audio_dim=24,
                    audio_pair_factor=2, tokens_per_frame=4,
                    emotion_classes=7, style_classes=6, num_timesteps=50,
                    max_seq_len=40,
                ),
                alibi, pe,
            )
            D = 32
            self.style_embedd = nn_t.Sequential(
                nn_t.Linear(6, D), nn_t.Mish()
            )
            self.latent_encoder = nn_t.Linear(D, D)

        def forward(self, x_t, t, audio_hidden, style):
            c = self.cfg
            B, L, C = x_t.shape
            x = x_t.reshape(B, L // c.tokens_per_frame, c.tokens_per_frame * C)
            T = x.shape[1]
            audio = audio_hidden.reshape(
                B, audio_hidden.shape[1] // c.audio_pair_factor,
                audio_hidden.shape[2] * c.audio_pair_factor,
            )[:, :T]
            af = self.audio_extract(audio)
            vf = self.latent_encoder(x)
            one_hot_t = torch.zeros(B, c.num_timesteps)
            one_hot_t[torch.arange(B), t] = 1.0
            vf = vf + self.style_embedd(style)[:, None]
            af = af + self.time_embedd(one_hot_t)[:, None]
            vf = vf + self.pe[:T][None]
            mem_mask = torch.from_numpy(~enc_dec_diagonal_allowed(T, T))
            # torch 3D attn_mask wants (B*H, T, T)
            tgt_mask = self.alibi[:, :T, :T].repeat(B, 1, 1)
            out = self.decoder(
                vf, af, tgt_mask=tgt_mask, memory_mask=mem_mask
            )
            return self.latent_decoder(out).reshape(B, L, C)

    replica = BiwiReplica().eval()
    sd = {
        k.replace("decoder.layers.", "transformer_decoder.layers."): v
        for k, v in replica.state_dict().items()
    }
    params = convert_fdm(sd, cfg)

    B, T = 2, 9
    L, C = T * 4, 8
    x_t = torch.randn(B, L, C)
    t = torch.tensor([7, 31])
    audio = torch.randn(B, T * 2, 24)
    style = torch.eye(6)[:B]
    with torch.no_grad():
        want = replica(x_t, t, audio, style).numpy()

    model = FDM(cfg, cross_mode="full")
    paired = audio.numpy().reshape(B, T, 2 * 24)  # our FDM takes pre-paired
    got = model.apply(
        params, jnp.asarray(x_t.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(paired), jnp.asarray(style.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_periodic_pe_matches_reference():
    """VOCASET PeriodicPositionalEncoding parity (torch oracle)."""
    ref = import_reference_module("models.fdm_vocaset")
    mod = ref.PeriodicPositionalEncoding(
        d_model=16, dropout=0.0, period=5, max_seq_len=23
    ).eval()
    ours = periodic_positional_encoding(5, 16, max_seq_len=23)
    with torch.no_grad():
        want = mod(torch.zeros(1, 23, 16)).numpy()[0]
    np.testing.assert_allclose(ours[:23], want, atol=1e-6)


def test_adain_conditioning_mode():
    """adain_conditioning renormalizes per-frame channel stats to the
    conditioning vector's stats (reference's dormant adaIN fusion)."""
    from fdm_tpu.models.fdm import _adain_channels

    content = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16)) * 3 + 1
    style = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    out = _adain_channels(content, style)
    # per-frame channel stats equal the style vector's stats
    np.testing.assert_allclose(
        np.asarray(out.mean(-1)),
        np.asarray(style.mean(-1))[:, None] * np.ones((1, 5)),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out.std(-1)),
        np.asarray(style.std(-1))[:, None] * np.ones((1, 5)),
        atol=1e-3,
    )

    cfg_add = small_cfg()
    import dataclasses
    cfg_ada = dataclasses.replace(cfg_add, adain_conditioning=True)
    B, T = 1, 6
    L, C = T * cfg_add.tokens_per_frame, cfg_add.feature_dim // cfg_add.tokens_per_frame
    x_t = jax.random.normal(jax.random.PRNGKey(2), (B, L, C))
    audio = jax.random.normal(
        jax.random.PRNGKey(3), (B, T, cfg_add.audio_dim * cfg_add.audio_pair_factor)
    )
    st = jnp.eye(5)[:B]; emo = jnp.eye(7)[:B]
    t = jnp.array([4], jnp.int32)
    model_add, model_ada = FDM(cfg_add), FDM(cfg_ada)
    params = model_add.init(jax.random.PRNGKey(4), x_t, t, audio, st, emo)
    # same param tree, different fusion; both finite, and they differ
    out_add = model_add.apply(params, x_t, t, audio, st, emo)
    out_ada = model_ada.apply(params, x_t, t, audio, st, emo)
    assert np.isfinite(np.asarray(out_ada)).all()
    # zero-init head makes both zero; compare pre-head by perturbing params
    # the fusion difference mostly collapses under the decoder LayerNorms;
    # assert it exists at all (the stats checks above verify the math)
    p2 = jax.tree_util.tree_map(lambda x: x + 0.1, params)
    d = np.abs(
        np.asarray(model_add.apply(p2, x_t, t, audio, st, emo))
        - np.asarray(model_ada.apply(p2, x_t, t, audio, st, emo))
    ).max()
    assert d > 1e-7


def test_remat_matches_plain():
    """nn.remat'd decoder layers: identical forward and gradients."""
    cfg = small_cfg()
    B, T = 1, 5
    L, C = T * cfg.tokens_per_frame, cfg.feature_dim // cfg.tokens_per_frame
    x_t = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (B, T, cfg.audio_dim * cfg.audio_pair_factor)
    )
    st, emo = jnp.eye(5)[:B], jnp.eye(7)[:B]
    t = jnp.array([9], jnp.int32)
    plain, remat = FDM(cfg), FDM(cfg, remat=True)
    params = plain.init(jax.random.PRNGKey(2), x_t, t, audio, st, emo)

    def loss(model, p):
        return jnp.sum(jnp.square(model.apply(p, x_t, t, audio, st, emo)))

    np.testing.assert_allclose(
        np.asarray(loss(plain, params)), np.asarray(loss(remat, params)),
        rtol=1e-6,
    )
    g1 = jax.grad(lambda p: loss(plain, p))(params)
    g2 = jax.grad(lambda p: loss(remat, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_hoisted_cross_attention_matches_denoise():
    """prepare_cross + per-step time_term == the per-step out(v(audio+time))
    evaluation (linear split under the diagonal mask) — the sampling-scan
    hoist must be numerically indistinguishable, including under CFG."""
    cfg = small_cfg()
    model = FDM(cfg)
    B, T = 2, 6
    L = T * cfg.tokens_per_frame
    C = cfg.feature_dim // cfg.tokens_per_frame
    x_t = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (B, T, cfg.audio_dim * cfg.audio_pair_factor)
    )
    style = jnp.eye(5)[:B]
    emo = jnp.eye(7)[:B]
    t = jnp.array([3, 41], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(2), x_t, t, audio, style, emo)
    # give the zero-init head signal
    params = jax.tree_util.tree_map(lambda p: p + 0.05, params)

    feat = model.apply(params, audio, method="prepare_audio")
    base = model.apply(params, x_t, t, feat, style, emo, method="denoise")
    cross = model.apply(params, feat, method="prepare_cross")
    hoisted = model.apply(
        params, x_t, t, feat, style, emo, True, cross, method="denoise"
    )
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(base), atol=1e-5, rtol=1e-5
    )

    # the generate path (which enables the hoist by default) agrees with the
    # explicitly unhoisted denoiser closure through the full sampler
    from fdm_tpu.configs import (
        DatasetConfig, DiffusionConfig, PipelineConfig, TrainConfig,
        VQVAEConfig,
    )
    from fdm_tpu.models import LatentDiffusion

    pcfg = PipelineConfig(
        dataset=DatasetConfig(emotion_classes=7, style_classes=5),
        vqvae=VQVAEConfig(
            in_dim=12, hidden_size=32, n_embed=14, zquant_dim=8,
            face_quan_num=4, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=32, quant_factor=0, emotion_classes=7,
        ),
        fdm=cfg,
        diffusion=DiffusionConfig(timesteps=cfg.num_timesteps,
                                  sample_steps=4, ddim_steps=4),
        train=TrainConfig(),
    )
    ld = LatentDiffusion.create(pcfg)
    for cfg_scale in (0.0, 2.5):
        fn_hoist = ld.make_denoise_fn(params, feat, style, emo, cfg_scale)
        fn_plain = ld.make_denoise_fn(params, feat, style, emo, cfg_scale,
                                      hoist_cross=False)
        a = fn_hoist(x_t, t)
        b = fn_plain(x_t, t)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5,
            err_msg=f"cfg_scale={cfg_scale}",
        )
