"""Full-sampler parity vs the reference GaussianDiffusion: with the same
initial noise and a shared deterministic x0-denoiser, our scan-based DDIM
(tail='reference') and ancestral DDPM must reproduce the reference
trajectories.

The reference diffusion modules import a deleted `text` module (quirk Q1);
the fixture installs an empty stub so they can load."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fdm_tpu.diffusion import ddim_sample, ddpm_sample, make_schedule

from reference_oracle import REFERENCE_ROOT

SHAPE = (1, 12, 8)
TIMESTEPS = 1000  # the reference hardcodes linspace over 1000 (ddim) and the
                  # buffers are built for timesteps=1000


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref_diffusion():
    """Import the reference diffusion module with stubs for its unused
    dependencies: the deleted `text` module (quirk Q1) plus
    torchvision/einops_exts/rotary_embedding_torch, which only the vestigial
    Unet3D/Trainer paths touch."""
    stubs = {
        "video_diffusion_pytorch.text": _stub_module(
            "video_diffusion_pytorch.text",
            tokenize=None, bert_embed=None, BERT_MODEL_DIM=768,
        ),
        "torchvision": _stub_module(
            "torchvision",
            transforms=_stub_module("transforms", ToTensor=lambda: None),
            utils=_stub_module("utils"),
        ),
        "torchvision.transforms": _stub_module(
            "torchvision.transforms", ToTensor=lambda: None
        ),
        "torchvision.utils": _stub_module("torchvision.utils"),
        "einops_exts": _stub_module(
            "einops_exts",
            check_shape=lambda *a, **k: None,
            rearrange_many=lambda *a, **k: None,
        ),
        "rotary_embedding_torch": _stub_module(
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

        mod = importlib.import_module(
            "video_diffusion_pytorch.diffusion_BIWI_encoder_decoder"
        )
        yield mod
    finally:
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
            else:
                sys.modules.pop(k, None)
        if added:
            sys.path.remove(REFERENCE_ROOT)


class _LinearDenoiser(torch.nn.Module):
    """Deterministic x0-predictor shared by both frameworks:
    x0_hat = 0.9 * x_t + 0.05 * audio-constant + t-dependent shift."""

    def forward(self, audio, t, x, one_hot):
        shift = (t.float() / TIMESTEPS).reshape(-1, 1, 1)
        return 0.9 * x + 0.05 - 0.1 * shift


def _jax_denoiser(x, t):
    shift = (t.astype(jnp.float32) / TIMESTEPS).reshape(-1, 1, 1)
    return 0.9 * x + 0.05 - 0.1 * shift


def test_ddim_trajectory_matches_reference(ref_diffusion):
    gd = ref_diffusion.GaussianDiffusion(
        _LinearDenoiser(), timesteps=TIMESTEPS, loss_type="l2"
    ).eval()

    x_init = np.random.RandomState(0).randn(*SHAPE).astype(np.float32)

    # the reference draws its own x_T with torch.randn; pin it
    calls = {"n": 0}
    real_randn = torch.randn

    def fake_randn(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            return torch.from_numpy(x_init.copy())
        return real_randn(*args, **kwargs)  # multiplied by sigma=0 (eta=0)

    steps = 50
    torch.randn, saved = fake_randn, torch.randn
    try:
        with torch.inference_mode():
            want = gd.ddim_sample(
                None, SHAPE, None, steps=steps
            ).numpy()
    finally:
        torch.randn = saved

    schedule = make_schedule(TIMESTEPS)

    # same pinned init on our side: ddim_sample takes a key, so re-express it
    # with a denoise closure and manual init by running the scan body math
    # through the public API with a key whose normal draw we replace — easiest
    # exact route: call the internal pieces like the sampler does.
    from fdm_tpu.diffusion.gaussian import (
        ddim_time_pairs, extract, predict_noise_from_start,
    )

    pairs = ddim_time_pairs(TIMESTEPS, steps)[:-1]  # tail='reference'
    x = jnp.asarray(x_init)
    for t_i, t_next in np.asarray(pairs):
        t = jnp.full((SHAPE[0],), t_i, jnp.int32)
        tn = jnp.full((SHAPE[0],), max(t_next, 0), jnp.int32)
        x0 = _jax_denoiser(x, t)
        eps = predict_noise_from_start(schedule, x, t, x0)
        ab_next = extract(schedule.alphas_cumprod, tn, x.ndim)
        x = x0 * jnp.sqrt(ab_next) + jnp.sqrt(1.0 - ab_next) * eps
    got = np.asarray(x)

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # and the public scan sampler agrees with the manual loop given the same
    # starting noise: verify by matching statistics-free determinism — run
    # ddim_sample twice with one key; its x_init differs from x_init above,
    # so instead check the full sampler against the SAME manual loop seeded
    # from its own x_init
    key = jax.random.PRNGKey(3)
    sampler_out = np.asarray(
        ddim_sample(schedule, _jax_denoiser, SHAPE, key, steps=steps)
    )
    init_key, _ = jax.random.split(key)  # ddim_sample splits (init, steps)
    x = jax.random.normal(jax.random.split(key)[1], SHAPE)  # placeholder
    # reproduce ddim_sample's own init draw
    k, init_k = jax.random.split(key)
    x = jax.random.normal(init_k, SHAPE)
    for t_i, t_next in np.asarray(pairs):
        t = jnp.full((SHAPE[0],), t_i, jnp.int32)
        tn = jnp.full((SHAPE[0],), max(t_next, 0), jnp.int32)
        x0 = _jax_denoiser(x, t)
        eps = predict_noise_from_start(schedule, x, t, x0)
        ab_next = extract(schedule.alphas_cumprod, tn, x.ndim)
        x = x0 * jnp.sqrt(ab_next) + jnp.sqrt(1.0 - ab_next) * eps
    np.testing.assert_allclose(sampler_out, np.asarray(x), atol=1e-5)


def test_ddpm_ancestral_matches_reference_math(ref_diffusion):
    """One ancestral step: our q_posterior update == the reference
    p_mean_variance + p_sample with zero noise injection."""
    gd = ref_diffusion.GaussianDiffusion(
        _LinearDenoiser(), timesteps=TIMESTEPS, loss_type="l2"
    ).eval()
    schedule = make_schedule(TIMESTEPS)

    rng = np.random.RandomState(1)
    x = rng.randn(*SHAPE).astype(np.float32)
    for t_i in [999, 500, 123, 1]:
        t_t = torch.full((SHAPE[0],), t_i, dtype=torch.long)
        with torch.inference_mode():
            mean, _, log_var = gd.p_mean_variance(
                torch.from_numpy(x.copy()), t_t, False, None, None
            )
        from fdm_tpu.diffusion import q_posterior

        t_j = jnp.full((SHAPE[0],), t_i, jnp.int32)
        x0 = _jax_denoiser(jnp.asarray(x), t_j)
        our_mean, _, our_log_var = q_posterior(
            schedule, x0, jnp.asarray(x), t_j
        )
        np.testing.assert_allclose(
            np.asarray(our_mean), mean.numpy(), atol=2e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(our_log_var), log_var.numpy(), atol=2e-5, rtol=1e-4
        )
