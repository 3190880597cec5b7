"""Tensor-parallel FDM: Megatron-split shardings over a (data, model) mesh
must reproduce single-device results for inference and the training step."""

import jax
import jax.numpy as jnp
import numpy as np

from fdm_tpu.parallel import batch_sharding, make_mesh
from fdm_tpu.parallel.tensor import fdm_tp_shardings, place_tp_params

from test_pipeline import tiny_pipeline, init_pipeline


def test_tp_shardings_cover_the_block_matmuls():
    cfg = tiny_pipeline()
    ld, _, fdm_params, *_ = init_pipeline(cfg)
    mesh = make_mesh((2, 4), axis_names=("data", "model"))
    shardings = fdm_tp_shardings(fdm_params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    sharded = [
        "/".join(getattr(k, "key", str(k)) for k in path)
        for path, s in flat if s.spec != jax.sharding.PartitionSpec()
    ]
    # every decoder-layer projection got a non-trivial spec
    for piece in ("self_attn/q", "self_attn/out", "linear1", "linear2"):
        assert any(piece in name for name in sharded), (piece, sharded[:8])


def test_tp_denoise_matches_single_device():
    cfg = tiny_pipeline()
    ld, _, fdm_params, motion, template, audio, style, emo = init_pipeline(cfg)
    B, T = motion.shape[0], motion.shape[1]
    L, C = T * cfg.fdm.tokens_per_frame, cfg.vqvae.zquant_dim
    x_t = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    t = jnp.zeros((B,), jnp.int32)

    def fwd(p, x_t, t, audio, style, emo):
        return ld.fdm.apply(p, x_t, t, audio, style, emo)

    want = jax.jit(fwd)(fdm_params, x_t, t, audio, style, emo)

    mesh = make_mesh((2, 4), axis_names=("data", "model"))
    p_tp = place_tp_params(fdm_params, mesh)
    bs = batch_sharding(mesh)  # batch over 'data'
    got = jax.jit(fwd)(
        p_tp,
        jax.device_put(x_t, bs), jax.device_put(t, bs),
        jax.device_put(audio, bs), jax.device_put(style, bs),
        jax.device_put(emo, bs),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )
    # params really are distributed over the model axis
    k = p_tp["params"]["layer_0"]["linear1"]["kernel"]
    assert len(k.sharding.device_set) >= 4
