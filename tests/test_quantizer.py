"""Quantizer parity vs the reference torch implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fdm_tpu.codec import quantize, codebook_lookup
from fdm_tpu.codec.quantizer import get_distances

from reference_oracle import import_reference_module


def test_plain_quantizer_matches_reference():
    ref_mod = import_reference_module("models.lib.quantizer")
    torch.manual_seed(0)
    n_e, d = 64, 16
    ref = ref_mod.VectorQuantizer(n_e, d, beta=0.25)
    z = torch.randn(2, 12, d)

    z_q_ref, loss_ref, (perp_ref, _, idx_ref) = ref(z)
    # reference returns z_q as (B, C, L)
    z_q_ref = z_q_ref.permute(0, 2, 1).detach().numpy()

    codebook = jnp.asarray(ref.embedding.weight.detach().numpy())
    out = quantize(codebook, jnp.asarray(z.numpy()), beta=0.25)

    np.testing.assert_allclose(out.z_q, z_q_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out.loss, loss_ref.item(), rtol=1e-5)
    np.testing.assert_allclose(out.perplexity, perp_ref.item(), rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(out.indices).reshape(-1), idx_ref.numpy().reshape(-1)
    )


def test_emotion_partitioned_quantizer_matches_reference():
    ref_mod = import_reference_module("models.vq_vae_emotion")
    torch.manual_seed(1)
    n_e, d, classes = 256 * 7, 8, 7  # reference hardcodes 256-entry slices
    ref = ref_mod.VectorQuantizer(n_e, d, beta=0.25)

    codebook = jnp.asarray(ref.embedding.weight.detach().numpy())
    for emotion in [0, 3, 6]:
        one_hot_t = torch.zeros(1, classes)
        one_hot_t[0, emotion] = 1.0
        z = torch.randn(1, 24, d)
        z_q_ref, loss_ref, (perp_ref, _, idx_ref) = ref(z, one_hot_t)
        z_q_ref = z_q_ref.permute(0, 2, 1).detach().numpy()

        out = quantize(
            codebook,
            jnp.asarray(z.numpy()),
            one_hot=jnp.asarray(one_hot_t.numpy()),
            partitions=classes,
            beta=0.25,
        )
        np.testing.assert_allclose(out.z_q, z_q_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out.loss, loss_ref.item(), rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(out.indices).reshape(-1), idx_ref.numpy().reshape(-1)
        )
        # global indices land in the right slice
        assert (np.asarray(out.global_indices) // 256 == emotion).all()


def test_partitioned_quantizer_supports_mixed_batch():
    """Unlike the reference (batch-global argmax, bs=1 only), ours handles
    per-sample emotions in one batch."""
    key = jax.random.PRNGKey(0)
    codebook = jax.random.normal(key, (14, 4))  # 7 partitions x 2 entries
    z = jax.random.normal(jax.random.PRNGKey(1), (7, 5, 4))
    one_hot = jnp.eye(7)
    out = quantize(codebook, z, one_hot=one_hot, partitions=7)
    parts = np.asarray(out.global_indices) // 2
    for b in range(7):
        assert (parts[b] == b).all()


def test_straight_through_gradients():
    codebook = jnp.eye(4, dtype=jnp.float32)
    z = jnp.ones((1, 3, 4)) * 0.3

    def recon_loss(z_in):
        out = quantize(codebook, z_in)
        return jnp.sum(out.z_q**2)

    g = jax.grad(recon_loss)(z)
    # straight-through: d(z_q)/d(z) == identity, so grad = 2 * z_q
    out = quantize(codebook, z)
    np.testing.assert_allclose(g, 2 * np.asarray(out.z_q), rtol=1e-5)


def test_codebook_lookup_and_distances():
    ref_mod = import_reference_module("models.lib.quantizer")
    torch.manual_seed(2)
    ref = ref_mod.VectorQuantizer(32, 8, beta=0.25)
    codebook = jnp.asarray(ref.embedding.weight.detach().numpy())

    idx = torch.randint(0, 32, (10,))
    ref_entries = ref.get_codebook_entry(idx, None).detach().numpy()
    ours = codebook_lookup(codebook, jnp.asarray(idx.numpy()))
    np.testing.assert_allclose(ours, ref_entries, rtol=1e-6)

    # distance values vs torch.cdist oracle (the reference's get_distance
    # output reshape is garbled dead code — models/lib/quantizer.py:72-74 —
    # so we check the math, not its layout)
    z = torch.randn(2, 6, 8)
    d_oracle = (torch.cdist(z, ref.embedding.weight[None].expand(2, -1, -1)) ** 2)
    d_ours = get_distances(codebook, jnp.asarray(z.numpy()))
    np.testing.assert_allclose(d_ours, d_oracle.detach().numpy(), rtol=1e-3, atol=1e-4)


def test_token_mask_excludes_padding():
    codebook = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 4))
    full = quantize(codebook, z)
    # pad with garbage and mask it out: masked loss equals unpadded loss
    z_pad = jnp.concatenate([z, jnp.full((1, 4, 4), 100.0)], axis=1)
    mask = jnp.concatenate([jnp.ones((1, 8)), jnp.zeros((1, 4))], axis=1)
    masked = quantize(codebook, z_pad, token_mask=mask)
    np.testing.assert_allclose(masked.loss, full.loss, rtol=1e-5)
    np.testing.assert_allclose(masked.perplexity, full.perplexity, rtol=1e-4)


def test_sample_codebook_init_seeds_from_token_pool():
    """Entries come from the token pool (+small jitter), per emotion slice
    when partitioned, with a global-pool fallback for absent emotions."""
    from fdm_tpu.codec.quantizer import sample_codebook_init

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    # two well-separated emotion clusters
    pool0 = rng.normal(5.0, 0.1, (40, 4)).astype(np.float32)
    pool1 = rng.normal(-5.0, 0.1, (30, 4)).astype(np.float32)
    tokens = np.concatenate([pool0, pool1])
    emo = np.array([0] * 40 + [1] * 30)

    cb = sample_codebook_init(key, tokens, (8, 4), emotion_ids=emo,
                              partitions=2)
    assert cb.shape == (8, 4)
    # slice 0 near +5, slice 1 near -5
    assert float(jnp.abs(cb[:4] - 5.0).max()) < 1.0
    assert float(jnp.abs(cb[4:] + 5.0).max()) < 1.0

    # emotion 2 absent -> falls back to the global pool (finite, in-range)
    cb3 = sample_codebook_init(key, tokens, (9, 4), emotion_ids=emo,
                               partitions=3)
    assert np.isfinite(np.asarray(cb3)).all()
    assert float(jnp.abs(cb3[6:]).max()) < 6.0

    # unpartitioned: quantizing the pool against the seeded codebook gives
    # a far lower quant loss than the reference's uniform(-1/N) init
    cb_flat = sample_codebook_init(key, tokens, (8, 4))
    z = jnp.asarray(tokens)[None]
    uniform = jax.random.uniform(key, (8, 4), minval=-1 / 8, maxval=1 / 8)
    assert float(quantize(cb_flat, z).loss) < 0.1 * float(
        quantize(uniform, z).loss
    )


def test_sample_codebook_init_validates_inputs():
    from fdm_tpu.codec.quantizer import sample_codebook_init

    key = jax.random.PRNGKey(0)
    tokens = np.ones((10, 4), np.float32)
    with pytest.raises(ValueError):
        sample_codebook_init(key, tokens, (8, 4), partitions=2)  # no ids
    with pytest.raises(ValueError):
        sample_codebook_init(key, tokens, (8, 4),
                             emotion_ids=np.zeros(3), partitions=2)
    with pytest.raises(ValueError):
        sample_codebook_init(key, np.empty((0, 4), np.float32), (8, 4))
