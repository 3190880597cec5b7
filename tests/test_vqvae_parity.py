"""Full-module VQ-VAE parity: reference torch model vs fdm_tpu with converted
weights. This is the strongest stage-1 correctness check we have — identical
inputs + identical weights must produce matching latents, codes, and
reconstructions."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fdm_tpu.configs import VQVAEConfig
from fdm_tpu.codec import VQAutoEncoder
from fdm_tpu.utils.torch_import import convert_vqvae

from reference_oracle import import_reference_module


def ref_args(**kw):
    ns = argparse.Namespace(
        n_embed=32, zquant_dim=8, in_dim=30, hidden_size=32, neg=0.2,
        quant_factor=0, INaffine=False, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48, face_quan_num=4,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def our_cfg(ns, emotion_classes=0):
    return VQVAEConfig(
        in_dim=ns.in_dim, hidden_size=ns.hidden_size,
        num_hidden_layers=ns.num_hidden_layers,
        num_attention_heads=ns.num_attention_heads,
        intermediate_size=ns.intermediate_size, neg_slope=ns.neg,
        quant_factor=ns.quant_factor, face_quan_num=ns.face_quan_num,
        zquant_dim=ns.zquant_dim, n_embed=ns.n_embed,
        emotion_classes=emotion_classes,
    )


def to_torch_sd(ref_model):
    return {k: v for k, v in ref_model.state_dict().items()}


def test_plain_vqvae_forward_parity():
    """BIWI-style plain codec (reference models/vq_vae.py)."""
    ref_mod = import_reference_module("models.vq_vae")
    torch.manual_seed(0)
    ns = ref_args()
    ref = ref_mod.VQAutoEncoder(ns).eval()

    cfg = our_cfg(ns)
    model = VQAutoEncoder(cfg)
    params = convert_vqvae(to_torch_sd(ref), cfg)

    x = torch.randn(1, 12, ns.in_dim)
    template = torch.zeros(1, 1, ns.in_dim)

    with torch.no_grad():
        # reference encode/quant/decode path as used by the trainers
        # (train/train_biwi_vqvae.py:60-62 style)
        h_ref = ref.encode(x - template)
        quant_ref, _, info = ref.quant(h_ref)
        dec_ref = ref.decode(quant_ref) + template

    h = jax.jit(
        lambda p, xx: VQAutoEncoder(cfg).apply(p, xx, method="encode")
    )(params, jnp.asarray((x - template).numpy()))
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), rtol=1e-2, atol=5e-4)

    q = VQAutoEncoder(cfg).apply(params, h, method="quant")
    np.testing.assert_array_equal(
        np.asarray(q.indices).reshape(-1), info[2].numpy().reshape(-1)
    )
    dec = VQAutoEncoder(cfg).apply(params, q.z_q, method="decode")
    dec = dec + jnp.asarray(template.numpy())
    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(), rtol=1e-2, atol=1e-3)


def test_emotion_vqvae_forward_parity():
    """MEAD EVQ-VAE (reference models/vq_vae_emotion.py) — the reference
    quantizer hardcodes 256-entry emotion slices, so n_embed=256*7."""
    ref_mod = import_reference_module("models.vq_vae_emotion")
    torch.manual_seed(1)
    ns = ref_args(n_embed=256 * 7)
    ref = ref_mod.VQAutoEncoder(ns).eval()

    cfg = our_cfg(ns, emotion_classes=7)
    model = VQAutoEncoder(cfg)
    params = convert_vqvae(to_torch_sd(ref), cfg)

    x = torch.randn(1, 8, ns.in_dim)
    template = torch.zeros(1, 1, ns.in_dim)
    one_hot = torch.zeros(1, 7)
    one_hot[0, 4] = 1.0

    with torch.no_grad():
        dec_ref, emb_loss_ref, info = ref(x, template, one_hot)

    dec, loss, _ = model.apply(
        params,
        jnp.asarray(x.numpy()),
        jnp.asarray(template.numpy()),
        jnp.asarray(one_hot.numpy()),
    )
    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(float(loss), emb_loss_ref.item(), rtol=1e-3)
