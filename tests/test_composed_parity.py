"""Full-size COMPOSED-pipeline parity vs the torch reference (CPU, fp32).

Round-2 VERDICT item 2: module-level parity (codec x3, FDM x2, sampler math)
leaves one place a layout/dtype bug could hide — the composition. These
tests run the reference's actual stage-2 compositions END TO END at
production dimensions, in both frameworks, from the same inputs and noise:

  train composition (reference train/train_diffusion_mead.py:87-103):
    latent = vq.encode(motion - template[, emo])
    x_noisy = q_sample(latent, t, noise)           [pinned t, noise]
    x_recon = FDM(audio, t, x_noisy, cond...)
    denoise_loss = mse(latent, x_recon)
    recon = vq.decode(vq.quant(x_recon)[0]) + template
    recon_loss = mse(recon, motion)                 [recone_loss :160-166]

  sample composition (reference samples/sample_diffusion_mead.py:78-86 /
  sample_diffusion_biwi.py:72-78, few-step DDIM per the verdict —
  diffusion_BIWI_encoder_decoder.py:675-711 math, identical buffers in the
  MEAD module):
    latent = ddim(FDM, x_init)                      [pinned x_init]
    vertices = vq.decode(vq.quant(latent)[0]) + template

Torch weights are synthetic (seeded init) and converted to our param trees
with the production converters, exactly like a user importing a trained
checkpoint. Both sides fp32 CPU. Marked slow (~2-3 min).
Max-abs errors are printed so PARITY.md can cite a real run.
"""

import argparse
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from reference_oracle import REFERENCE_ROOT, import_reference_module

from fdm_tpu.codec import VQAutoEncoder
from fdm_tpu.configs import get_config
from fdm_tpu.diffusion import ddim_sample, make_schedule, p_losses, q_sample
from fdm_tpu.models.fdm import FDM
from fdm_tpu.utils.torch_import import convert_fdm, convert_vqvae

pytestmark = pytest.mark.slow

DDIM_STEPS = 4
T_FIXED = 500


def _maxabs(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


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


@pytest.fixture(scope="module")
def ref_gd_module():
    """Reference GaussianDiffusion module (BIWI file: the importable one;
    the MEAD module's q_sample/posterior/DDIM buffers are line-identical)
    with stubs for its unused vestigial-path imports (quirk Q1)."""

    def _stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        return mod

    stubs = {
        "video_diffusion_pytorch.text": _stub(
            "video_diffusion_pytorch.text",
            tokenize=None, bert_embed=None, BERT_MODEL_DIM=768,
        ),
        "torchvision": _stub(
            "torchvision",
            transforms=_stub("transforms", ToTensor=lambda: None),
            utils=_stub("utils"),
        ),
        "torchvision.transforms": _stub(
            "torchvision.transforms", ToTensor=lambda: None
        ),
        "torchvision.utils": _stub("torchvision.utils"),
        "einops_exts": _stub(
            "einops_exts",
            check_shape=lambda *a, **k: None,
            rearrange_many=lambda *a, **k: None,
        ),
        "rotary_embedding_torch": _stub(
            "rotary_embedding_torch", RotaryEmbedding=object
        ),
    }
    added = REFERENCE_ROOT not in sys.path
    if added:
        sys.path.insert(0, REFERENCE_ROOT)
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        import importlib

        yield importlib.import_module(
            "video_diffusion_pytorch.diffusion_BIWI_encoder_decoder"
        )
    finally:
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
            else:
                sys.modules.pop(k, None)
        if added:
            sys.path.remove(REFERENCE_ROOT)


def _build_stack(dataset, seed, frames):
    """Full-size torch codec + torch FDM replica with synthetic weights,
    converted to our param trees; plus shared inputs."""
    from test_fdm import TorchFDMReplica, replica_state_dict_to_ours
    from fdm_tpu.ops.masks import alibi_biased_mask, enc_dec_diagonal_allowed
    from fdm_tpu.ops.positional import sinusoidal_table

    pcfg = get_config(dataset)
    vq_cfg, fdm_cfg = pcfg.vqvae, pcfg.fdm
    torch.manual_seed(seed)

    ref_vq_mod = import_reference_module(
        "models.vq_vae_emotion" if dataset == "mead" else "models.vq_vae"
    )
    ref_vq = ref_vq_mod.VQAutoEncoder(_ref_args_from_cfg(vq_cfg)).eval()
    vq_params = convert_vqvae(dict(ref_vq.state_dict()), vq_cfg)

    alibi = torch.from_numpy(
        alibi_biased_mask(fdm_cfg.n_head, fdm_cfg.max_seq_len,
                          fdm_cfg.alibi_period)
    )
    pe = torch.from_numpy(
        np.asarray(sinusoidal_table(fdm_cfg.max_seq_len, fdm_cfg.feature_dim))
    ).float()
    replica = TorchFDMReplica(fdm_cfg, alibi, pe)
    if dataset == "biwi":
        import torch.nn as nn_t

        D = fdm_cfg.feature_dim
        replica.style_embedd = nn_t.Sequential(
            nn_t.Linear(fdm_cfg.style_classes, D), nn_t.Mish()
        )
        replica.latent_encoder = nn_t.Linear(D, D)
    replica = replica.eval()
    sd = {
        k.replace("decoder.layers.", "transformer_decoder.layers."): v
        for k, v in replica.state_dict().items()
    }
    fdm_params = (
        replica_state_dict_to_ours(replica, fdm_cfg) if dataset == "mead"
        else convert_fdm(sd, fdm_cfg)
    )

    B, T = 1, frames
    rng = np.random.RandomState(seed)
    motion = torch.from_numpy(
        (rng.randn(B, T, vq_cfg.in_dim) * 0.01).astype(np.float32)
    )
    template = torch.zeros(B, 1, vq_cfg.in_dim)
    audio_hidden = torch.from_numpy(
        rng.randn(B, T * fdm_cfg.audio_pair_factor,
                  fdm_cfg.audio_dim).astype(np.float32)
    )
    style = torch.zeros(B, fdm_cfg.style_classes)
    style[0, 1] = 1.0
    emo = None
    if dataset == "mead":
        emo = torch.zeros(B, fdm_cfg.emotion_classes)
        emo[0, 4] = 1.0

    def torch_denoise(x, t):
        """Reference FDM call order: denoise_fn(audio, t, x, cond...)."""
        if dataset == "mead":
            return replica(x, t, audio_hidden, emo, style)
        c = replica.cfg
        B2, L2, C2 = x.shape
        xf = x.reshape(B2, L2 // c.tokens_per_frame,
                       c.tokens_per_frame * C2)
        T2 = xf.shape[1]
        audio = audio_hidden.reshape(
            B2, audio_hidden.shape[1] // c.audio_pair_factor,
            audio_hidden.shape[2] * c.audio_pair_factor,
        )[:, :T2]
        af = replica.audio_extract(audio)
        vf = replica.latent_encoder(xf)
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

    return types.SimpleNamespace(
        pcfg=pcfg, vq_cfg=vq_cfg, fdm_cfg=fdm_cfg,
        ref_vq=ref_vq, vq_params=vq_params, fdm_params=fdm_params,
        motion=motion, template=template, audio_hidden=audio_hidden,
        style=style, emo=emo, torch_denoise=torch_denoise, rng=rng,
    )


def _jax_denoise_fn(s, hoist=False):
    """hoist=True runs the PRODUCTION sampling path (per-clip
    prepare_cross + per-step time term, the generate() default) so the
    DDIM composition is proven against torch at full size through the
    optimized program, not just the reference-shaped one."""
    model = FDM(s.fdm_cfg)
    audio_paired = jnp.asarray(
        s.audio_hidden.reshape(
            s.audio_hidden.shape[0],
            s.audio_hidden.shape[1] // s.fdm_cfg.audio_pair_factor,
            s.audio_hidden.shape[2] * s.fdm_cfg.audio_pair_factor,
        ).numpy()
    )
    feat = model.apply(s.fdm_params, audio_paired, method="prepare_audio")
    style_j = jnp.asarray(s.style.numpy())
    emo_j = jnp.asarray(s.emo.numpy()) if s.emo is not None else None
    cross = (
        model.apply(s.fdm_params, feat, method="prepare_cross")
        if hoist else None
    )

    def denoise(x, t):
        return model.apply(
            s.fdm_params, x, t, feat, style_j, emo_j, True, cross,
            method="denoise",
        )

    return denoise, emo_j


def _run_composed(dataset, seed, frames, ref_gd_module):
    s = _build_stack(dataset, seed, frames)
    vq = VQAutoEncoder(s.vq_cfg)
    schedule = make_schedule(s.fdm_cfg.num_timesteps)
    gd = ref_gd_module.GaussianDiffusion(
        None, timesteps=s.fdm_cfg.num_timesteps, loss_type="l2"
    ).eval()
    gd.denoise_fn = lambda audio, t, x, one_hot: s.torch_denoise(x, t)

    B, T = s.motion.shape[0], s.motion.shape[1]
    L = T * s.vq_cfg.face_quan_num
    noise = torch.from_numpy(
        s.rng.randn(B, L, s.vq_cfg.zquant_dim).astype(np.float32)
    )
    x_init = torch.from_numpy(
        s.rng.randn(B, L, s.vq_cfg.zquant_dim).astype(np.float32)
    )
    t = torch.full((B,), T_FIXED, dtype=torch.long)
    denoise_j, emo_j = _jax_denoise_fn(s)
    motion_j = jnp.asarray(s.motion.numpy())
    template_j = jnp.asarray(s.template.numpy())

    # ---------------- torch: train composition ----------------
    with torch.no_grad():
        if dataset == "mead":
            latent_ref = s.ref_vq.encode(s.motion - s.template, s.emo)
        else:
            latent_ref = s.ref_vq.encode(s.motion - s.template)
        x_noisy_ref = gd.q_sample(latent_ref, t, noise)
        x_recon_ref = s.torch_denoise(x_noisy_ref, t)
        denoise_loss_ref = F.mse_loss(latent_ref, x_recon_ref)
        if dataset == "mead":
            quanted_ref, _, _ = s.ref_vq.quant(x_recon_ref, s.emo)
        else:
            quanted_ref, _, _ = s.ref_vq.quant(x_recon_ref)
        out_motion_ref = s.ref_vq.decode(quanted_ref) + s.template
        recon_loss_ref = F.mse_loss(out_motion_ref, s.motion)

    # ---------------- ours: train composition ----------------
    latent = vq.apply(
        s.vq_params, motion_j - template_j, emo_j, None, method="encode"
    )
    e_lat = _maxabs(latent, latent_ref.numpy())
    x_noisy = q_sample(
        schedule, latent, jnp.asarray(t.numpy()), jnp.asarray(noise.numpy())
    )
    e_noisy = _maxabs(x_noisy, x_noisy_ref.numpy())
    denoise_loss, x_recon = p_losses(
        schedule, denoise_j, latent, jnp.asarray(t.numpy()),
        jnp.asarray(noise.numpy()), loss_type="l2",
    )
    e_recon = _maxabs(x_recon, x_recon_ref.numpy())
    q = vq.apply(s.vq_params, x_recon, emo_j, method="quant")
    out_motion = vq.apply(s.vq_params, q.z_q, method="decode") + template_j
    recon_loss = jnp.mean(jnp.square(out_motion - motion_j))
    e_out = _maxabs(out_motion, out_motion_ref.numpy())
    e_dl = abs(float(denoise_loss) - float(denoise_loss_ref)) / max(
        abs(float(denoise_loss_ref)), 1e-8
    )
    e_rl = abs(float(recon_loss) - float(recon_loss_ref)) / max(
        abs(float(recon_loss_ref)), 1e-8
    )

    # ---------------- torch: DDIM-4 sample composition ----------------
    calls = {"n": 0}
    real_randn = torch.randn

    def fake_randn(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            return x_init.clone()
        return real_randn(*args, **kwargs)  # eta=0: multiplied by sigma=0

    torch.randn = fake_randn
    try:
        with torch.inference_mode():
            latent_sampled_ref = gd.ddim_sample(
                None, tuple(x_init.shape), None, steps=DDIM_STEPS
            )
    finally:
        torch.randn = real_randn
    assert calls["n"] >= 1
    with torch.no_grad():
        if dataset == "mead":
            qs_ref, _, info_ref = s.ref_vq.quant(latent_sampled_ref, s.emo)
        else:
            qs_ref, _, info_ref = s.ref_vq.quant(latent_sampled_ref)
        verts_ref = s.ref_vq.decode(qs_ref) + s.template

    # ---------------- ours: DDIM-4 sample composition ----------------
    # the sample side runs the PRODUCTION hoisted denoiser (generate()'s
    # default) — proving the optimized path against torch at full size
    denoise_hoisted, _ = _jax_denoise_fn(s, hoist=True)
    latent_sampled = ddim_sample(
        schedule, denoise_hoisted, tuple(x_init.shape), jax.random.PRNGKey(0),
        steps=DDIM_STEPS, x_init=jnp.asarray(x_init.numpy()),
    )
    e_traj = _maxabs(latent_sampled, latent_sampled_ref.numpy())
    qs = vq.apply(s.vq_params, latent_sampled, emo_j, method="quant")
    codes_equal = bool(np.array_equal(
        np.asarray(qs.indices).reshape(-1),
        info_ref[2].numpy().reshape(-1),
    ))
    verts = vq.apply(s.vq_params, qs.z_q, method="decode") + template_j
    e_verts = _maxabs(verts, verts_ref.numpy())

    print(
        f"[composed-parity] {dataset} T={T} in_dim={s.vq_cfg.in_dim}: "
        f"latent={e_lat:.2e} q_sample={e_noisy:.2e} fdm_x0={e_recon:.2e} "
        f"train_out={e_out:.2e} dLoss_rel={e_dl:.2e} "
        f"dReconLoss_rel={e_rl:.2e} | "
        f"ddim{DDIM_STEPS}_traj={e_traj:.2e} codes_equal={codes_equal} "
        f"verts={e_verts:.2e}"
    )
    assert e_lat < 1e-3
    assert e_noisy < 1e-3
    assert e_recon < 1e-3
    assert e_out < 1e-3
    assert e_dl < 2e-4 and e_rl < 2e-4  # relative
    assert e_traj < 1e-3
    assert codes_equal
    assert e_verts < 1e-3


def test_mead_composed_fullsize_parity(ref_gd_module):
    """MEAD: 15069-dim FLAME vertices, emotion-partitioned 1792-codebook,
    512-dim 8-layer FDM (reference train/train_diffusion_mead.py:87-103,
    samples/sample_diffusion_mead.py:78-86)."""
    _run_composed("mead", seed=11, frames=8, ref_gd_module=ref_gd_module)


def test_biwi_composed_fullsize_parity(ref_gd_module):
    """BIWI: 70110-dim vertices, zquant 128, 1024-dim 8-layer FDM
    (reference train/train_diffusion_biwi.py:80-93,
    samples/sample_diffusion_biwi.py:72-78)."""
    _run_composed("biwi", seed=12, frames=4, ref_gd_module=ref_gd_module)
