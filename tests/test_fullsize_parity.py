"""Full-production-dimension parity vs the in-image torch reference (CPU).

Round-1 VERDICT item 2: the tiny-dim parity tests can't catch shape- or
layout-dependent conversion bugs (packed-QKV head splits, 15069/70110-dim
linears, 1792-entry partitioned codebooks). These tests run the SAME parity
harnesses at the reference's real sizes:

  * MEAD EVQ-VAE  : in_dim=15069, hidden 1024, 6 layers, 8 heads, n_embed
                    1792 (reference models/utils/config.py:4-20,
                    models/vq_vae_emotion.py)
  * BIWI VQ-VAE   : in_dim=70110, zquant 128 (config.py:44-57, vq_vae.py)
  * VOCASET VQ-VAE: fq 16, post/pre linear absent (config.py:64-77,
                    vq_vae_vocaset.py)
  * MEAD FDM      : 512-dim, 8 layers, 1000 timesteps, hubert-width audio
                    (models/fdm_vqvae_mead.py:9-52) vs the torch replica
  * BIWI FDM      : 1024-dim, 8 layers (models/fdm.py:10-52)

All comparisons are fp32. Marked slow: ~2-4 min total on CPU.
Max-abs errors are printed so the PARITY.md table can cite a real run.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_oracle import import_reference_module

from fdm_tpu.configs import get_config
from fdm_tpu.codec import VQAutoEncoder
from fdm_tpu.models.fdm import FDM
from fdm_tpu.utils.torch_import import convert_vqvae

pytestmark = pytest.mark.slow


def _ref_args_from_cfg(cfg):
    return argparse.Namespace(
        n_embed=cfg.n_embed, zquant_dim=cfg.zquant_dim, in_dim=cfg.in_dim,
        hidden_size=cfg.hidden_size, neg=cfg.neg_slope,
        quant_factor=cfg.quant_factor, INaffine=False,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        face_quan_num=cfg.face_quan_num,
    )


def _maxabs(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def _run_vqvae_parity(ref_module_name, cfg, with_emotion, seed, frames=8):
    ref_mod = import_reference_module(ref_module_name)
    torch.manual_seed(seed)
    ref = ref_mod.VQAutoEncoder(_ref_args_from_cfg(cfg)).eval()
    params = convert_vqvae(
        {k: v for k, v in ref.state_dict().items()}, cfg
    )
    model = VQAutoEncoder(cfg)

    x = torch.randn(1, frames, cfg.in_dim) * 0.01
    template = torch.zeros(1, 1, cfg.in_dim)
    one_hot = None
    if with_emotion:
        one_hot = torch.zeros(1, cfg.emotion_classes)
        one_hot[0, 3] = 1.0

    with torch.no_grad():
        if with_emotion:
            h_ref = ref.encode(x - template, one_hot)
            quant_ref, _, info = ref.quant(h_ref, one_hot)
        else:
            h_ref = ref.encode(x - template)
            quant_ref, _, info = ref.quant(h_ref)
        dec_ref = ref.decode(quant_ref) + template

    emo_j = jnp.asarray(one_hot.numpy()) if with_emotion else None
    h = jax.jit(
        lambda p, xx: model.apply(p, xx, emo_j, method="encode")
    )(params, jnp.asarray((x - template).numpy()))
    e_lat = _maxabs(h, h_ref.numpy())

    if with_emotion:
        q = model.apply(params, h, emo_j, method="quant")
    else:
        q = model.apply(params, h, method="quant")
    codes_equal = bool(
        np.array_equal(
            np.asarray(q.indices).reshape(-1), info[2].numpy().reshape(-1)
        )
    )
    dec = model.apply(params, q.z_q, method="decode") + jnp.asarray(
        template.numpy()
    )
    e_dec = _maxabs(dec, dec_ref.numpy())

    print(
        f"[fullsize-parity] {ref_module_name} in_dim={cfg.in_dim} "
        f"hidden={cfg.hidden_size}: latent maxabs={e_lat:.2e}, "
        f"codes_equal={codes_equal}, recon maxabs={e_dec:.2e}"
    )
    # latents are O(1) activations after 1024-wide matmul chains; 1e-3 abs
    # is ~1e-6 relative per accumulated term
    assert e_lat < 2e-3
    assert codes_equal
    assert e_dec < 2e-3


def test_mead_evqvae_fullsize_parity():
    cfg = get_config("mead").vqvae
    assert (cfg.in_dim, cfg.hidden_size, cfg.n_embed) == (15069, 1024, 1792)
    _run_vqvae_parity("models.vq_vae_emotion", cfg, with_emotion=True, seed=0)


def test_biwi_vqvae_fullsize_parity():
    cfg = get_config("biwi").vqvae
    assert (cfg.in_dim, cfg.zquant_dim) == (70110, 128)
    _run_vqvae_parity("models.vq_vae", cfg, with_emotion=False, seed=1,
                      frames=4)


def test_vocaset_vqvae_fullsize_parity():
    cfg = get_config("vocaset").vqvae
    assert (cfg.face_quan_num, cfg.post_pre_linear) == (16, False)
    _run_vqvae_parity("models.vq_vae_vocaset", cfg, with_emotion=False,
                      seed=2)


def _run_fdm_fullsize(dataset, seed, frames=8):
    from test_fdm import TorchFDMReplica, replica_state_dict_to_ours
    from fdm_tpu.ops.masks import alibi_biased_mask
    from fdm_tpu.ops.positional import sinusoidal_table

    cfg = get_config(dataset).fdm
    torch.manual_seed(seed)
    alibi = torch.from_numpy(
        alibi_biased_mask(cfg.n_head, cfg.max_seq_len, cfg.alibi_period)
    )
    pe = torch.from_numpy(
        np.asarray(sinusoidal_table(cfg.max_seq_len, cfg.feature_dim))
    ).float()

    B, T = 1, frames
    L = T * cfg.tokens_per_frame
    C = cfg.feature_dim // cfg.tokens_per_frame
    x_t = torch.randn(B, L, C)
    audio_hidden = torch.randn(B, T * cfg.audio_pair_factor, cfg.audio_dim)
    t_step = torch.tensor([777 % cfg.num_timesteps])
    style = torch.zeros(B, cfg.style_classes)
    style[0, 2] = 1.0

    if dataset == "mead":
        replica = TorchFDMReplica(cfg, alibi, pe).eval()
        emo = torch.zeros(B, cfg.emotion_classes)
        emo[0, 5] = 1.0
        with torch.no_grad():
            ref_out = replica(x_t, t_step, audio_hidden, emo, style).numpy()
        params = replica_state_dict_to_ours(replica, cfg)
        emo_j = jnp.asarray(emo.numpy())
    else:  # biwi flavor: Mish style embed, bare latent encoder
        import torch.nn as nn_t

        replica = TorchFDMReplica(cfg, alibi, pe)
        D = cfg.feature_dim
        replica.style_embedd = nn_t.Sequential(
            nn_t.Linear(cfg.style_classes, D), nn_t.Mish()
        )
        replica.latent_encoder = nn_t.Linear(D, D)
        replica = replica.eval()

        from fdm_tpu.ops.masks import enc_dec_diagonal_allowed

        def biwi_forward(x_t, t, audio_hidden, style):
            c = replica.cfg
            B2, L2, C2 = x_t.shape
            x = x_t.reshape(B2, L2 // c.tokens_per_frame,
                            c.tokens_per_frame * C2)
            T2 = x.shape[1]
            audio = audio_hidden.reshape(
                B2, audio_hidden.shape[1] // c.audio_pair_factor,
                audio_hidden.shape[2] * c.audio_pair_factor,
            )[:, :T2]
            af = replica.audio_extract(audio)
            vf = replica.latent_encoder(x)
            one_hot_t = torch.zeros(B2, c.num_timesteps)
            one_hot_t[torch.arange(B2), t] = 1.0
            vf = vf + replica.style_embedd(style)[:, None]
            af = af + replica.time_embedd(one_hot_t)[:, None]
            vf = vf + replica.pe[:T2][None]
            mem_mask = torch.from_numpy(~enc_dec_diagonal_allowed(T2, T2))
            out = replica.decoder(
                vf, af, tgt_mask=replica.alibi[:, :T2, :T2],
                memory_mask=mem_mask,
            )
            return replica.latent_decoder(out).reshape(B2, L2, C2)

        with torch.no_grad():
            ref_out = biwi_forward(x_t, t_step, audio_hidden, style).numpy()
        from fdm_tpu.utils.torch_import import convert_fdm

        sd = {
            k.replace("decoder.layers.", "transformer_decoder.layers."): v
            for k, v in replica.state_dict().items()
        }
        params = convert_fdm(sd, cfg)
        emo_j = None

    audio_paired = jnp.asarray(
        audio_hidden.reshape(
            B, T, cfg.audio_dim * cfg.audio_pair_factor
        ).numpy()
    )
    model = FDM(cfg)
    out = model.apply(
        params, jnp.asarray(x_t.numpy()), jnp.asarray(t_step.numpy()),
        audio_paired, jnp.asarray(style.numpy()), emo_j,
    )
    err = _maxabs(out, ref_out)
    scale = float(np.abs(ref_out).max())
    print(
        f"[fullsize-parity] FDM {dataset} D={cfg.feature_dim} "
        f"layers={cfg.num_layers}: out maxabs={err:.2e} (|ref|max={scale:.2f})"
    )
    assert err < 5e-4 * max(1.0, scale)


def test_mead_fdm_fullsize_parity():
    _run_fdm_fullsize("mead", seed=3)


def test_biwi_fdm_fullsize_parity():
    _run_fdm_fullsize("biwi", seed=4)
