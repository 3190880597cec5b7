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


def test_dp_tp_train_step_matches_single_device():
    """Full stage-2 TRAIN step (loss, grads, AdamW update) with the FDM
    tensor-parallel over 'model' and the batch sharded over 'data' must
    reproduce the single-device step bit-for-tolerance: XLA inserts the
    grad psums (data) and activation collectives (model) from the input
    shardings alone."""
    from fdm_tpu.parallel import shard_batch
    from fdm_tpu.parallel.tensor import fdm_tp_shardings
    from fdm_tpu.train import (
        create_train_state, default_optimizer, make_stage2_step,
    )

    cfg = tiny_pipeline()
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    batch = {
        "motion": motion, "template": template, "audio_hidden": audio,
        "style_one_hot": style, "emotion_one_hot": emo,
    }
    key = jax.random.PRNGKey(9)
    tx = default_optimizer()

    # reference: one device, no donation so we can reuse inputs
    ref_state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, fdm_params), tx
    )
    ref_step = make_stage2_step(ld, tx, vq_params, donate=False)
    # zero-init output head: take TWO steps so gradient reaches everything
    ref_state, _ = ref_step(ref_state, batch, key)
    ref_state, ref_metrics = ref_step(ref_state, batch, key)

    # DP x TP over the 8-device virtual mesh
    mesh = make_mesh((2, 4), axis_names=("data", "model"))
    p_tp = place_tp_params(fdm_params, mesh)
    tp_state = create_train_state(p_tp, tx)  # opt state inherits shardings
    tp_batch = shard_batch(batch, mesh)
    tp_step = make_stage2_step(ld, tx, vq_params, donate=False)
    tp_state, _ = tp_step(tp_state, tp_batch, key)
    tp_state, tp_metrics = tp_step(tp_state, tp_batch, key)

    np.testing.assert_allclose(
        float(tp_metrics["loss"]), float(ref_metrics["loss"]),
        rtol=2e-5, atol=1e-6,
    )
    # updated parameters agree leaf-by-leaf
    ref_flat = jax.tree_util.tree_leaves(ref_state.params)
    tp_flat = jax.tree_util.tree_leaves(tp_state.params)
    for a, b in zip(ref_flat, tp_flat):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-3
        )
    # moments stayed tensor-parallel: the linear1 kernel's Adam mu is
    # distributed like the kernel itself
    shardings = fdm_tp_shardings(fdm_params, mesh)
    k_spec = shardings["params"]["layer_0"]["linear1"]["kernel"].spec
    mu = tp_state.opt_state[0].mu["params"]["layer_0"]["linear1"]["kernel"]
    assert len(mu.sharding.device_set) >= 4, mu.sharding
    assert k_spec != jax.sharding.PartitionSpec()
