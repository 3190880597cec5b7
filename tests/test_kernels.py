"""Pallas kernels (interpret mode on CPU) vs their XLA oracles and vs the
framework's reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdm_tpu.kernels.adain import adain_pallas, adain_xla
from fdm_tpu.kernels.attention import (
    alibi_attention_pallas,
    alibi_attention_xla,
)
from fdm_tpu.kernels.quantize import nearest_code, nearest_code_pallas
from fdm_tpu.ops.masks import alibi_biased_mask


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestAlibiAttention:
    @pytest.mark.parametrize("T,period", [(37, 30), (128, 25), (150, 30)])
    def test_pallas_matches_xla(self, T, period):
        B, H, hd = 2, 4, 32
        q, k, v = (_rand(i, (B, H, T, hd)) for i in range(3))
        got = alibi_attention_pallas(q, k, v, period, interpret=True)
        want = alibi_attention_xla(q, k, v, period)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_xla_matches_bias_table_attention(self):
        """The fused bias regeneration must equal the precomputed
        (H, L, L) ALiBi table used by the dense FDM path."""
        B, H, T, hd, period = 1, 4, 50, 16, 30
        q, k, v = (_rand(i + 7, (B, H, T, hd)) for i in range(3))
        table = jnp.asarray(alibi_biased_mask(H, 64, period)[:, :T, :T])
        logits = jnp.einsum("bhid,bhjd->bhij", q, k) * (hd**-0.5) + table[None]
        attn = jax.nn.softmax(logits, axis=-1)
        want = jnp.einsum("bhij,bhjd->bhid", attn, v)
        got = alibi_attention_xla(q, k, v, period)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_padding_rows_do_not_leak(self):
        """Output for a length-T query must be unchanged by K/V padding."""
        B, H, hd, period = 1, 2, 8, 25
        q, k, v = (_rand(i + 3, (B, H, 40, hd)) for i in range(3))
        got = alibi_attention_pallas(q, k, v, period, interpret=True)
        assert got.shape == (B, H, 40, hd)
        assert np.isfinite(np.asarray(got)).all()


class TestNearestCode:
    def test_pallas_matches_xla_plain(self):
        z = _rand(0, (57, 24))
        codebook = _rand(1, (40, 24))
        got = nearest_code_pallas(z, codebook, interpret=True)
        want = nearest_code(z, codebook, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_pallas_matches_xla_partitioned(self):
        partitions = 7
        z = _rand(2, (33, 16))
        codebook = _rand(3, (7 * 8, 16))
        part = jnp.asarray(np.random.RandomState(0).randint(0, 7, 33))
        got = nearest_code_pallas(
            z, codebook, part, partitions, interpret=True
        )
        want = nearest_code(
            z, codebook, part, partitions, use_pallas=False
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        slice_size = codebook.shape[0] // partitions
        np.testing.assert_array_equal(
            np.asarray(got) // slice_size, np.asarray(part)
        )

    def test_matches_quantizer_module(self):
        """Kernel indices == fdm_tpu.codec.quantizer global indices."""
        from fdm_tpu.codec import quantize

        B, L, D, N, P = 2, 9, 12, 21, 7
        z = _rand(5, (B, L, D))
        codebook = _rand(6, (N, D))
        one_hot = jnp.eye(P)[jnp.asarray([2, 5])]
        out = quantize(codebook, z, one_hot, partitions=P)
        part = jnp.repeat(jnp.argmax(one_hot, -1), L)
        got = nearest_code_pallas(
            z.reshape(B * L, D), codebook, part, P, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(got).reshape(B, L), np.asarray(out.global_indices)
        )


class TestAdaIN:
    def test_pallas_matches_xla(self):
        content = _rand(0, (2, 12, 37))
        style = _rand(1, (2, 12, 53)) * 2.0 + 1.0
        got = adain_pallas(content, style, interpret=True)
        want = adain_xla(content, style)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-4)

    def test_output_adopts_style_stats(self):
        content = _rand(2, (1, 4, 200))
        style = _rand(3, (1, 4, 200)) * 3.0 - 2.0
        out = np.asarray(adain_xla(content, style))
        s = np.asarray(style)
        np.testing.assert_allclose(
            out.mean(axis=-1), s.mean(axis=-1), atol=1e-3
        )
        np.testing.assert_allclose(
            out.std(axis=-1), s.std(axis=-1), atol=1e-2
        )


class TestFDMFusedAttention:
    def test_fused_mode_matches_table_mode(self):
        """FDM with self_attn_mode='fused' (XLA fallback off-TPU) must equal
        the dense bias-table path with identical parameters."""
        import jax
        import jax.numpy as jnp

        from fdm_tpu.configs import FDMConfig
        from fdm_tpu.models import FDM

        cfg = FDMConfig(
            feature_dim=32, n_head=4, num_layers=2, audio_dim=12,
            audio_pair_factor=2, tokens_per_frame=4, emotion_classes=7,
            style_classes=5, num_timesteps=20, max_seq_len=64,
            dropout=0.0,
        )
        B, T = 2, 19
        L, C = T * cfg.tokens_per_frame, 32 // 4
        x_t = _rand(0, (B, L, C))
        t = jnp.asarray([3, 17])
        audio = _rand(1, (B, T, cfg.audio_dim * cfg.audio_pair_factor))
        style = jnp.eye(5)[:B]
        emo = jnp.eye(7)[:B]

        table_fdm = FDM(cfg, self_attn_mode="table")
        fused_fdm = FDM(cfg, self_attn_mode="fused")
        params = table_fdm.init(jax.random.PRNGKey(0), x_t, t, audio, style, emo)
        want = table_fdm.apply(params, x_t, t, audio, style, emo)
        got = fused_fdm.apply(params, x_t, t, audio, style, emo)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )


class TestFlashAttention:
    @pytest.mark.parametrize("T,bq,bk", [(100, 32, 32), (300, 64, 128),
                                         (512, 128, 128)])
    def test_flash_matches_xla(self, T, bq, bk):
        from fdm_tpu.kernels.attention import alibi_attention_flash

        B, H, hd = 1, 4, 16
        q, k, v = (_rand(i + 11, (B, H, T, hd)) for i in range(3))
        got = alibi_attention_flash(
            q, k, v, 30, block_q=bq, block_k=bk, interpret=True
        )
        want = alibi_attention_xla(q, k, v, 30)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_flash_matches_single_tile_kernel(self):
        from fdm_tpu.kernels.attention import alibi_attention_flash

        B, H, T, hd = 2, 2, 130, 8
        q, k, v = (_rand(i + 21, (B, H, T, hd)) for i in range(3))
        flash = alibi_attention_flash(
            q, k, v, 25, block_q=64, block_k=64, interpret=True
        )
        tile = alibi_attention_pallas(q, k, v, 25, interpret=True)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(tile),
                                   atol=1e-5, rtol=1e-5)


def test_fused_mode_builds_no_alibi_table():
    """In fused mode the (H, L, L) ALiBi table is never materialized —
    alibi_bias returns None and denoise still works (the kernel regenerates
    the bias); the table would be an O(L^2) HLO constant at long L."""
    from test_pipeline import tiny_pipeline
    from fdm_tpu.models.fdm import FDM

    cfg = tiny_pipeline().fdm
    fdm = FDM(cfg, self_attn_mode="fused")
    B, T = 1, 8
    L, C = T * cfg.tokens_per_frame, cfg.feature_dim // cfg.tokens_per_frame
    x_t = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    t = jnp.zeros((B,), jnp.int32)
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.feature_dim))
    style = jnp.eye(cfg.style_classes)[:B]
    emo = jnp.eye(cfg.emotion_classes)[:B]
    params = fdm.init(jax.random.PRNGKey(2), x_t, t, audio, style, emo,
                      method="denoise")
    assert fdm.apply(params, T, method="alibi_bias") is None
    out = fdm.apply(params, x_t, t, audio, style, emo, method="denoise")
    assert jnp.isfinite(out).all()


def test_flash_handles_non_divisible_block_pair():
    """block_q that does not divide round_up(T, block_k) used to leave tail
    q-blocks unwritten (NaN rows); Tp now rounds to lcm(block_q, block_k)."""
    from fdm_tpu.kernels.attention import (
        alibi_attention_flash, alibi_attention_xla,
    )

    B, H, T, hd = 1, 2, 120, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, T, hd))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, T, hd))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, hd))
    got = alibi_attention_flash(
        q, k, v, period=25, block_q=48, block_k=128, interpret=True
    )
    assert jnp.isfinite(got).all()
    want = alibi_attention_xla(q, k, v, 25)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_nearest_code_partition_args_validated():
    """partition_ids without partitions must raise an actionable error, not
    ZeroDivisionError from N // 0 at trace time."""
    import jax.numpy as jnp
    import pytest

    from fdm_tpu.kernels.quantize import nearest_code, nearest_code_pallas

    z = jnp.zeros((4, 8))
    codebook = jnp.zeros((16, 8))
    ids = jnp.zeros((4,), jnp.int32)
    with pytest.raises(ValueError, match="partitions > 0"):
        nearest_code(z, codebook, partition_ids=ids)
    with pytest.raises(ValueError, match="partitions > 0"):
        nearest_code_pallas(z, codebook, partition_ids=ids)
