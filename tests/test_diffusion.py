"""Unit tests for the diffusion math core against an independent torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fdm_tpu.diffusion import (
    make_schedule,
    cosine_beta_schedule,
    q_sample,
    q_posterior,
    p_losses,
    predict_noise_from_start,
    predict_start_from_noise,
    ddpm_sample,
    ddim_sample,
    ddim_time_pairs,
)


def torch_cosine_betas(timesteps, s=0.008):
    steps = timesteps + 1
    x = torch.linspace(0, timesteps, steps, dtype=torch.float64)
    ac = torch.cos(((x / timesteps) + s) / (1 + s) * torch.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return torch.clip(betas, 0, 0.9999)


def test_cosine_schedule_matches_torch_oracle():
    ours = cosine_beta_schedule(1000)
    oracle = torch_cosine_betas(1000).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-12, atol=1e-12)


def test_schedule_derived_quantities():
    sched = make_schedule(100)
    betas = np.asarray(sched.betas, dtype=np.float64)
    alphas_cumprod = np.cumprod(1 - betas)
    # float32 betas re-accumulated in float64 vs our float64-native cumprod:
    # loose rtol for the tiny tail values, tight atol overall
    np.testing.assert_allclose(
        sched.alphas_cumprod, alphas_cumprod, rtol=1e-3, atol=1e-9
    )
    np.testing.assert_allclose(
        sched.sqrt_alphas_cumprod**2 + sched.sqrt_one_minus_alphas_cumprod**2,
        np.ones(100),
        atol=1e-6,
    )
    # posterior variance at t=0 is 0 (clipped in log space)
    assert sched.posterior_variance[0] == 0.0
    assert np.isfinite(sched.posterior_log_variance_clipped).all()


def test_q_sample_interpolates():
    sched = make_schedule(1000)
    x0 = jnp.ones((2, 8, 4))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 999], dtype=jnp.int32)
    xt = q_sample(sched, x0, t, noise)
    # with zero noise, x_t = sqrt(abar_t) * x0
    np.testing.assert_allclose(xt[0], np.sqrt(sched.alphas_cumprod[0]), rtol=1e-6)
    np.testing.assert_allclose(xt[1], np.sqrt(sched.alphas_cumprod[999]), rtol=1e-6)


def test_noise_start_roundtrip():
    sched = make_schedule(1000)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 16, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([17, 800], dtype=jnp.int32)
    xt = q_sample(sched, x0, t, noise)
    noise_hat = predict_noise_from_start(sched, xt, t, x0)
    np.testing.assert_allclose(noise_hat, noise, rtol=1e-3, atol=1e-4)
    x0_hat = predict_start_from_noise(sched, xt, t, noise)
    np.testing.assert_allclose(x0_hat, x0, rtol=1e-3, atol=1e-4)


def test_q_posterior_matches_torch_oracle():
    """Posterior coefficients against independently-derived DDPM formulas."""
    T = 50
    sched = make_schedule(T)
    betas = torch_cosine_betas(T)
    alphas = 1 - betas
    abar = torch.cumprod(alphas, 0)
    abar_prev = torch.cat([torch.ones(1, dtype=abar.dtype), abar[:-1]])
    coef1 = betas * torch.sqrt(abar_prev) / (1 - abar)
    coef2 = (1 - abar_prev) * torch.sqrt(alphas) / (1 - abar)

    x0 = np.random.RandomState(0).randn(1, 4, 3).astype(np.float32)
    xt = np.random.RandomState(1).randn(1, 4, 3).astype(np.float32)
    for ti in [0, 10, 49]:
        t = jnp.array([ti], dtype=jnp.int32)
        mean, var, _ = q_posterior(sched, jnp.asarray(x0), jnp.asarray(xt), t)
        oracle_mean = coef1[ti].item() * x0 + coef2[ti].item() * xt
        np.testing.assert_allclose(mean, oracle_mean, rtol=1e-4, atol=1e-5)
        oracle_var = (betas[ti] * (1 - abar_prev[ti]) / (1 - abar[ti])).item()
        np.testing.assert_allclose(var.reshape(()), oracle_var, rtol=1e-4, atol=1e-8)


def test_p_losses_l2_and_mask():
    sched = make_schedule(100)
    x0 = jnp.ones((2, 6, 4))
    noise = jnp.zeros_like(x0)
    t = jnp.zeros((2,), dtype=jnp.int32)

    # denoiser that returns the noisy input: loss = mean((x0 - x_t)^2)
    denoise = lambda x, t_: x
    loss, x_recon = p_losses(sched, denoise, x0, t, noise, loss_type="l2")
    expected = np.mean((np.asarray(x0) - np.sqrt(sched.alphas_cumprod[0])) ** 2)
    np.testing.assert_allclose(loss, expected, rtol=1e-5)

    # mask zeroes out half of the sequence
    mask = jnp.concatenate([jnp.ones((2, 3)), jnp.zeros((2, 3))], axis=1)
    loss_m, _ = p_losses(sched, denoise, x0, t, noise, loss_type="l2", mask=mask)
    np.testing.assert_allclose(loss_m, expected, rtol=1e-5)  # uniform error


def test_ddpm_sample_converges_to_fixed_x0():
    """A perfect x0-denoiser must pull ancestral sampling onto x0."""
    sched = make_schedule(50)
    target = jnp.full((1, 4, 2), 3.0)
    denoise = lambda x, t: target
    out = ddpm_sample(sched, denoise, target.shape, jax.random.PRNGKey(0))
    # final variance is posterior_variance[0] == 0, so result is exactly mean
    np.testing.assert_allclose(out, target, rtol=1e-4, atol=1e-3)


def test_ddim_time_pairs_match_reference_discretization():
    pairs = ddim_time_pairs(1000, 50)
    assert pairs.shape == (50, 2)
    assert pairs[0, 0] == 999
    assert pairs[-1, 1] == -1
    # reference: times = linspace(-1, 999, 51)
    times = np.linspace(-1, 999, 51).astype(np.int32)
    assert pairs[0, 1] == times[-2]


@pytest.mark.parametrize("tail", ["reference", "x0"])
def test_ddim_sample_perfect_denoiser(tail):
    sched = make_schedule(1000)
    target = jnp.full((1, 4, 2), -1.5)
    denoise = lambda x, t: target
    out = ddim_sample(
        sched, denoise, target.shape, jax.random.PRNGKey(1), steps=50, tail=tail
    )
    if tail == "x0":
        np.testing.assert_allclose(out, target, rtol=1e-5)
    else:
        # reference leaves the sample at noise level t_min = 19
        t_min = 19
        scale = np.sqrt(sched.alphas_cumprod[t_min])
        np.testing.assert_allclose(out, np.asarray(target) * 0 + scale * (-1.5), atol=0.2)


def test_ddim_eta_positive_is_finite_and_correct_variance():
    """eta>0 DDIM must stay finite (the reference's dead eta-branch carries
    an inverted (1-abar) ratio that NaNs on the first pair — we implement
    the standard Song et al. sigma instead) and must converge to x0 with
    only per-step noise of the correct scale."""
    sched = make_schedule(1000)
    target = jnp.full((2, 4, 2), -1.5)
    denoise = lambda x, t: target
    for eta in (0.5, 1.0):
        out = ddim_sample(
            sched, denoise, target.shape, jax.random.PRNGKey(2),
            steps=50, eta=eta, tail="x0",
        )
        assert bool(jnp.isfinite(out).all()), f"eta={eta} produced NaN"
        # tail='x0' returns the final clean prediction regardless of noise
        np.testing.assert_allclose(out, target, rtol=1e-5)
        # the stochastic trajectory must genuinely differ from eta=0
        ref = ddim_sample(
            sched, denoise, target.shape, jax.random.PRNGKey(2),
            steps=50, eta=0.0, tail="reference",
        )
        sto = ddim_sample(
            sched, denoise, target.shape, jax.random.PRNGKey(2),
            steps=50, eta=eta, tail="reference",
        )
        assert bool(jnp.isfinite(sto).all())
        assert float(jnp.abs(sto - ref).max()) > 1e-3


def test_sampler_step_counts_validated():
    """Oversized step counts used to clamp schedule gathers silently (XLA
    out-of-range gather) and zero the FDM timestep one-hot; both samplers
    now reject them at trace time."""
    sched = make_schedule(20)
    denoise = lambda x, t: x * 0.9
    with pytest.raises(ValueError, match="num_steps"):
        ddpm_sample(sched, denoise, (1, 4, 2), jax.random.PRNGKey(0),
                    num_steps=50)
    with pytest.raises(ValueError, match="steps"):
        ddim_sample(sched, denoise, (1, 4, 2), jax.random.PRNGKey(0),
                    steps=50)
    with pytest.raises(ValueError, match="num_steps"):
        ddpm_sample(sched, denoise, (1, 4, 2), jax.random.PRNGKey(0),
                    num_steps=0)


def test_samplers_are_jittable():
    sched = make_schedule(20)
    denoise = lambda x, t: x * 0.9
    shape = (1, 4, 2)
    f = jax.jit(
        lambda k: ddpm_sample(sched, denoise, shape, k)
    )
    g = jax.jit(
        lambda k: ddim_sample(sched, denoise, shape, k, steps=5)
    )
    assert f(jax.random.PRNGKey(0)).shape == shape
    assert g(jax.random.PRNGKey(0)).shape == shape


def test_ddpm_unroll_is_numerically_identical():
    """Scan unrolling must not change the sampled trajectory at all."""
    schedule = make_schedule(20)
    fn = lambda x, t: 0.9 * x
    key = jax.random.PRNGKey(5)
    a = ddpm_sample(schedule, fn, (1, 6, 4), key, num_steps=20, unroll=1)
    b = ddpm_sample(schedule, fn, (1, 6, 4), key, num_steps=20, unroll=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # non-dividing unroll falls to the largest divisor rather than erroring
    c = ddpm_sample(schedule, fn, (1, 6, 4), key, num_steps=20, unroll=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_ddim_unroll_is_numerically_identical():
    schedule = make_schedule(100)
    fn = lambda x, t: 0.9 * x
    key = jax.random.PRNGKey(6)
    # steps=9 -> 8 scanned pairs (divisible) AND the reference headline
    # configs steps=50/100 -> 49/99 pairs (indivisible: remainder path)
    for steps in (9, 50, 100):
        a = ddim_sample(schedule, fn, (1, 4, 8), key, steps=steps, unroll=1)
        b = ddim_sample(schedule, fn, (1, 4, 8), key, steps=steps, unroll=4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddpm_unroll_remainder_is_numerically_identical():
    schedule = make_schedule(100)
    fn = lambda x, t: 0.9 * x
    key = jax.random.PRNGKey(7)
    # 23 steps: 23 = 5*4 + 3 -> quotient scan + inline remainder
    a = ddpm_sample(schedule, fn, (1, 4, 8), key, num_steps=23, unroll=1)
    b = ddpm_sample(schedule, fn, (1, 4, 8), key, num_steps=23, unroll=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_with_remainder_applies_body_in_order():
    from fdm_tpu.diffusion.gaussian import _scan_with_remainder

    xs = jnp.arange(49, dtype=jnp.float32)
    body = lambda c, x: (c * 1.01 + x, None)
    expect = 0.0
    for v in np.arange(49, dtype=np.float32):
        expect = expect * 1.01 + v
    for unroll in (1, 4, 8, 49, 64):
        got = _scan_with_remainder(body, jnp.float32(0.0), xs, 49, unroll)
        np.testing.assert_allclose(float(got), expect, rtol=1e-6)


def test_per_row_keys_isolate_noise_streams():
    """A batch of per-row PRNG keys gives each row its own noise stream:
    row i's sample depends only on key i, not on the co-batched keys —
    the property the serving layer's mixed-seed batching rests on."""
    schedule = make_schedule(timesteps=20)
    shape = (2, 8, 4)

    def denoise_fn(x, t):
        return 0.5 * x  # row-independent

    kA, kB, kC = (jax.random.PRNGKey(s) for s in (1, 2, 3))
    for sampler, kw in (
        (ddpm_sample, dict(num_steps=20)),
        (ddim_sample, dict(steps=5, eta=0.0)),
        (ddim_sample, dict(steps=5, eta=0.5)),
    ):
        ab = sampler(schedule, denoise_fn, shape, jnp.stack([kA, kB]), **kw)
        ac = sampler(schedule, denoise_fn, shape, jnp.stack([kA, kC]), **kw)
        np.testing.assert_array_equal(np.asarray(ab[0]), np.asarray(ac[0]))
        # different keys must actually give different rows
        assert not np.allclose(np.asarray(ab[0]), np.asarray(ab[1]))
        assert not np.allclose(np.asarray(ab[1]), np.asarray(ac[1]))


def test_per_row_keys_batch_mismatch_raises():
    schedule = make_schedule(timesteps=4)

    def denoise_fn(x, t):
        return x

    keys = jnp.stack([jax.random.PRNGKey(0)] * 3)
    with pytest.raises(ValueError, match="per-row keys"):
        ddpm_sample(schedule, denoise_fn, (2, 4, 2), keys, num_steps=4)


def test_single_key_path_unchanged_by_per_row_support():
    """The one-key path must stay bit-identical to the original stream
    semantics (split once for x_T, then split(num_steps)) — golden-value
    check against a hand-rolled replica of that stream."""
    schedule = make_schedule(timesteps=6)
    shape = (2, 4, 3)

    def denoise_fn(x, t):
        return 0.9 * x

    key = jax.random.PRNGKey(7)
    out = ddpm_sample(schedule, denoise_fn, shape, key, num_steps=6)

    rest, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape)
    step_keys = jax.random.split(rest, 6)
    from fdm_tpu.diffusion.gaussian import q_posterior as qp
    for i, t_scalar in enumerate(range(5, -1, -1)):
        t = jnp.full((2,), t_scalar, jnp.int32)
        mean, _, log_var = qp(schedule, 0.9 * x, x, t)
        noise = jax.random.normal(step_keys[i], shape)
        nz = 1.0 if t_scalar > 0 else 0.0
        x = mean + nz * jnp.exp(0.5 * log_var) * noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
