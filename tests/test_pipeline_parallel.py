"""Pipeline-parallel FDM denoiser: GPipe staging over a Mesh(('pipe',))
must reproduce the plain single-device denoise exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdm_tpu.parallel import make_mesh
from fdm_tpu.parallel.pipeline import make_pp_denoise

from test_pipeline import tiny_pipeline, init_pipeline


def _four_layer_setup():
    import dataclasses

    cfg = tiny_pipeline()
    cfg = dataclasses.replace(
        cfg, fdm=dataclasses.replace(cfg.fdm, num_layers=4)
    )
    from fdm_tpu.models import LatentDiffusion

    ld = LatentDiffusion.create(cfg)
    B, T = 8, 8
    L = T * cfg.fdm.tokens_per_frame
    C = cfg.fdm.feature_dim // cfg.fdm.tokens_per_frame
    x_t = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    t = jnp.arange(B, dtype=jnp.int32) % cfg.fdm.num_timesteps
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (B, T, cfg.fdm.feature_dim)
    )
    style = jnp.eye(cfg.fdm.style_classes)[jnp.arange(B) % cfg.fdm.style_classes]
    emo = jnp.eye(7)[jnp.arange(B) % 7]
    fdm_params = ld.fdm.init(
        jax.random.PRNGKey(2), x_t, t, audio, style, emo, method="denoise"
    )
    return ld, fdm_params, x_t, t, audio, style, emo


@pytest.mark.parametrize("stages,micro", [(4, 4), (2, 2), (4, 8)])
def test_pp_denoise_matches_plain(stages, micro):
    ld, fdm_params, x_t, t, audio, style, emo = _four_layer_setup()

    want = jax.jit(
        lambda p, *a: ld.fdm.apply(p, *a, method="denoise")
    )(fdm_params, x_t, t, audio, style, emo)

    mesh = make_mesh((stages,), axis_names=("pipe",))
    denoise_fn, prepare = make_pp_denoise(ld, mesh, num_microbatches=micro)
    fdm_p, staged = prepare(fdm_params)
    got = jax.jit(denoise_fn)(fdm_p, staged, x_t, t, audio, style, emo)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_pp_rejects_indivisible_layers():
    ld, fdm_params, *_ = _four_layer_setup()
    mesh = make_mesh((3,), axis_names=("pipe",))
    with pytest.raises(ValueError, match="pipeline"):
        make_pp_denoise(ld, mesh, num_microbatches=2)


def test_pp_denoise_gradients_match_plain():
    """jax.grad through the shard_map pipeline (ppermute transposes to the
    reverse permute) equals the single-device gradients — PP is usable for
    training, not just inference."""
    ld, fdm_params, x_t, t, audio, style, emo = _four_layer_setup()

    def plain_loss(p):
        out = ld.fdm.apply(p, x_t, t, audio, style, emo, method="denoise")
        return jnp.sum(out ** 2)

    g_want = jax.jit(jax.grad(plain_loss))(fdm_params)

    mesh = make_mesh((4,), axis_names=("pipe",))
    denoise_fn, prepare = make_pp_denoise(ld, mesh, num_microbatches=4)

    def pp_loss(p):
        fdm_p, staged = prepare(p)
        out = denoise_fn(fdm_p, staged, x_t, t, audio, style, emo)
        return jnp.sum(out ** 2)

    g_got = jax.jit(jax.grad(pp_loss))(fdm_params)

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_want),
        jax.tree_util.tree_leaves_with_path(g_got),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-3,
            err_msg=str(path),
        )
