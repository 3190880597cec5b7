"""Training: jitted steps, loss decreases, 8-device data-parallel equivalence,
checkpoint save/restore."""

import jax
import jax.numpy as jnp
import numpy as np

from fdm_tpu.models import LatentDiffusion
from fdm_tpu.parallel import make_mesh, shard_batch
from fdm_tpu.train import (
    TrainState,
    Trainer,
    create_train_state,
    default_optimizer,
    make_stage1_step,
    make_stage2_step,
    replicate_state,
)

from test_pipeline import tiny_pipeline, init_pipeline


def _stage1_batch(cfg, B=8, T=8, seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "motion": jax.random.normal(k, (B, T, cfg.vqvae.in_dim)) * 0.1,
        "template": jnp.zeros((B, 1, cfg.vqvae.in_dim)),
        "emotion_one_hot": jnp.eye(7)[jnp.arange(B) % 7],
    }


def test_stage1_training_reduces_loss():
    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    tx = default_optimizer(1e-3)
    state = create_train_state(vq_params, tx)
    step = make_stage1_step(ld, tx)
    batch = _stage1_batch(cfg)

    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    # VQ training is noisy at tiny scale (codebook churn); require a clear
    # downward trend rather than monotone decrease
    assert np.mean(losses[-5:]) < losses[0] * 0.95, losses[::5]


def test_stage2_step_runs():
    cfg = tiny_pipeline()
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    tx = default_optimizer()
    state = create_train_state(fdm_params, tx)
    step = make_stage2_step(ld, tx, vq_params)
    batch = {
        "motion": motion,
        "template": template,
        "audio_hidden": audio,
        "style_one_hot": style,
        "emotion_one_hot": emo,
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(metrics["loss"])
    assert int(state.step) == 1


def test_data_parallel_matches_single_device():
    """The same step on an 8-device mesh must produce the same params as
    single-device execution (same global batch)."""
    import optax

    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    # SGD so the param delta IS the (reduced) gradient — AdamW would amplify
    # reduction-order float noise on near-zero gradients into +-lr sign flips
    tx = optax.sgd(0.1)
    batch = _stage1_batch(cfg, B=8)

    # single device
    state1 = create_train_state(vq_params, tx)
    step1 = make_stage1_step(ld, tx, donate=False)
    state1, m1 = step1(state1, batch)

    # 8-device mesh
    mesh = make_mesh()
    assert mesh.devices.size == 8
    state8 = replicate_state(create_train_state(vq_params, tx), mesh)
    step8 = make_stage1_step(ld, tx, donate=False)
    sharded = shard_batch(batch, mesh)
    state8, m8 = step8(state8, sharded)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainer_epoch_and_checkpoint(tmp_path):
    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    tx = default_optimizer()
    state = create_train_state(vq_params, tx)
    step = make_stage1_step(ld, tx)

    from fdm_tpu.utils.checkpoint import Checkpointer
    from fdm_tpu.utils.logging import MetricLogger

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    logger = MetricLogger(str(tmp_path / "logs"), tensorboard=False)
    trainer = Trainer(
        step, state, logger=logger, checkpointer=ckpt, checkpoint_every=1
    )
    batches = [_stage1_batch(cfg, seed=s) for s in range(3)]
    means = trainer.run_epoch(iter(batches), epoch=1)
    assert means["steps"] == 3
    assert np.isfinite(means["loss"])

    # restore round-trip preserves params and step
    restored = ckpt.restore(target=trainer.state)
    np.testing.assert_array_equal(
        int(restored.step), int(trainer.state.step)
    )
    a = jax.tree_util.tree_leaves(restored.params)[0]
    b = jax.tree_util.tree_leaves(trainer.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    logger.close()
    ckpt.close()


def test_async_checkpoint_snapshot_survives_donation(tmp_path):
    """Async save snapshots the state at save() time: the trainer's donated
    step may immediately invalidate the original buffers and keep training,
    yet restore() must return the values as of the save."""
    from fdm_tpu.utils.checkpoint import Checkpointer

    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    tx = default_optimizer(1e-3)
    state = create_train_state(vq_params, tx)
    step = make_stage1_step(ld, tx)   # donates its input state
    batch = _stage1_batch(cfg)

    state, _ = step(state, batch)
    state, _ = step(state, batch)    # zero-init head: move twice
    saved_leaf = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    ).copy()
    saved_step = int(state.step)

    ckpt = Checkpointer(str(tmp_path / "ckpt"), async_save=True)
    ckpt.save(saved_step, state)
    # keep training right away: donation invalidates the pre-save buffers
    # while the background thread is still writing
    for _ in range(3):
        state, _ = step(state, batch)
    assert int(state.step) == saved_step + 3

    restored = ckpt.restore(target=state)   # joins the in-flight save
    assert int(restored.step) == saved_step
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]), saved_leaf
    )
    # a second save over the first (join-then-save path) also works
    ckpt.save(int(state.step), state)
    assert ckpt.latest_step() == int(state.step)
    ckpt.close()


def test_sync_checkpoint_paths(tmp_path, monkeypatch):
    """async_save=False and the low-HBM-headroom fallback both stream the
    state synchronously (no snapshot thread) and round-trip correctly."""
    import fdm_tpu.utils.checkpoint as ckpt_mod

    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    tx = default_optimizer(1e-3)
    state = create_train_state(vq_params, tx)
    step = make_stage1_step(ld, tx, donate=False)
    batch = _stage1_batch(cfg)
    state, _ = step(state, batch)

    # explicit sync
    ckpt = ckpt_mod.Checkpointer(str(tmp_path / "a"), async_save=False)
    ckpt.save(int(state.step), state)
    assert ckpt._thread is None
    restored = ckpt.restore(target=state)
    assert int(restored.step) == int(state.step)
    ckpt.close()

    # async requested, but no headroom for the on-device snapshot -> the
    # save must fall back to the synchronous path instead of OOMing
    monkeypatch.setattr(ckpt_mod, "_device_free_bytes", lambda: 1)
    ckpt2 = ckpt_mod.Checkpointer(str(tmp_path / "b"), async_save=True)
    ckpt2.save(int(state.step), state)
    assert ckpt2._thread is None
    assert ckpt2.latest_step() == int(state.step)
    ckpt2.close()


def test_ema_and_grad_accumulation():
    import optax

    from fdm_tpu.train import accumulating_optimizer

    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    base = optax.sgd(0.1)
    tx = accumulating_optimizer(base, every=2)
    state = create_train_state(vq_params, tx, ema_decay=0.9)
    step = make_stage1_step(ld, tx, donate=False, ema_decay=0.9)
    batch = _stage1_batch(cfg, B=4)

    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = step(state, batch)
    # first micro-batch: MultiSteps holds updates, params unchanged
    np.testing.assert_array_equal(
        jax.tree_util.tree_leaves(state.params)[0], p0
    )
    state, _ = step(state, batch)
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p2), np.asarray(p0))
    # EMA trails the raw params: ema = 0.9*old + 0.1*new at each step
    e2 = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(e2), np.asarray(p2))
    expected = 0.9 * (0.9 * p0 + 0.1 * p0) + 0.1 * p2
    np.testing.assert_allclose(np.asarray(e2), np.asarray(expected), rtol=1e-5)


def test_ema_config_mismatch_raises_both_directions():
    """ema_decay is configured in two places; BOTH silent mismatches must
    fail at trace time — a decay-0 step on an EMA-carrying state (stale
    copy) and a decay>0 step on a state without ema_params (EMA silently
    never updated)."""
    import optax
    import pytest

    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    tx = optax.sgd(0.1)
    batch = _stage1_batch(cfg, B=2)

    state_ema = create_train_state(vq_params, tx, ema_decay=0.9)
    step_plain = make_stage1_step(ld, tx, donate=False, ema_decay=0.0)
    with pytest.raises(ValueError, match="ema_decay=0"):
        step_plain(state_ema, batch)

    state_plain = create_train_state(vq_params, tx, ema_decay=0.0)
    step_ema = make_stage1_step(ld, tx, donate=False, ema_decay=0.9)
    with pytest.raises(ValueError, match="no\\s+ema_params"):
        step_ema(state_plain, batch)


def test_stage2_e2e_trains_audio_encoder_with_frozen_conv():
    """Joint FDM+audio-encoder training (reference quirk Q10): the encoder
    transformer must receive updates while the conv feature extractor stays
    frozen."""
    from fdm_tpu.models import LatentDiffusion
    from fdm_tpu.train import frozen_aware_optimizer, make_stage2_e2e_step

    cfg = tiny_pipeline()
    ld = LatentDiffusion.create(
        cfg, with_audio_encoder=True, allow_tiny_audio_encoder=True
    )
    B, T = 2, 8
    sr_samples = int(T / 25 * 16000)
    key = jax.random.PRNGKey(0)
    motion = jax.random.normal(key, (B, T, cfg.vqvae.in_dim)) * 0.1
    template = jnp.zeros((B, 1, cfg.vqvae.in_dim))
    wav = jax.random.normal(jax.random.PRNGKey(1), (B, sr_samples)) * 0.1
    style = jnp.eye(cfg.fdm.style_classes)[:B]
    emo = jnp.eye(7)[:B]

    vq_params = ld.vqvae.init(jax.random.PRNGKey(2), motion, template, emo)
    audio_params = ld.audio_encoder.init(jax.random.PRNGKey(3), wav)
    hidden = ld.encode_audio(audio_params, wav, T)
    assert hidden.shape[:2] == (B, T)
    L = T * cfg.fdm.tokens_per_frame
    C = cfg.fdm.feature_dim // cfg.fdm.tokens_per_frame
    fdm_params = ld.fdm.init(
        jax.random.PRNGKey(4), jnp.zeros((B, L, C)),
        jnp.zeros((B,), jnp.int32), hidden, style, emo,
    )

    import optax

    params = {"fdm": fdm_params, "audio": audio_params}
    tx = frozen_aware_optimizer(optax.sgd(0.05), params)
    state = create_train_state(params, tx)
    step = make_stage2_e2e_step(ld, tx, vq_params, donate=False)
    batch = {
        "motion": motion, "template": template, "audio": wav,
        "style_one_hot": style, "emotion_one_hot": emo,
    }
    # step 1: the FDM's zero-initialized output layer (reference parity)
    # blocks all upstream gradients, so only that layer moves; step 2 then
    # propagates into the audio encoder
    mid_state, metrics = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))
    new_state, metrics = step(mid_state, batch, jax.random.PRNGKey(6))
    assert np.isfinite(float(metrics["loss"]))

    old_audio = state.params["audio"]["params"]
    new_audio = new_state.params["audio"]["params"]
    # conv extractor frozen
    for a, b in zip(
        jax.tree_util.tree_leaves(old_audio["feature_extractor"]),
        jax.tree_util.tree_leaves(new_audio["feature_extractor"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # encoder transformer trained
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(old_audio["layer_0"]),
            jax.tree_util.tree_leaves(new_audio["layer_0"]),
        )
    )
    assert changed, "audio transformer received no updates"
    # FDM trained too
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params["fdm"]),
            jax.tree_util.tree_leaves(new_state.params["fdm"]),
        )
    )


def test_multi_step_scan_equals_sequential_steps():
    """make_multi_step (K steps per dispatch via lax.scan) must produce the
    SAME training trajectory as K sequential step calls — same params, same
    optimizer state, and metrics equal to the per-step mean."""
    import optax

    from fdm_tpu.train import make_multi_step

    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    tx = optax.adamw(1e-3)
    step = make_stage1_step(ld, tx, donate=False)

    K, B, T = 3, 2, 8
    batches = []
    for i in range(K):
        k = jax.random.PRNGKey(100 + i)
        batches.append({
            "motion": jax.random.normal(k, (B, T, cfg.vqvae.in_dim)) * 0.1,
            "template": jnp.zeros((B, 1, cfg.vqvae.in_dim)),
            "emotion_one_hot": jnp.eye(7)[jnp.arange(B) % 7],
        })
    stacked = {
        key: jnp.stack([b[key] for b in batches]) for key in batches[0]
    }

    state_seq = create_train_state(vq_params, tx)
    per_step = []
    for b in batches:
        state_seq, m = step(state_seq, b)
        per_step.append(m)

    multi = make_multi_step(step, needs_rng=False)
    state_scan, m_scan = multi(
        create_train_state(vq_params, tx), stacked, jax.random.PRNGKey(0)
    )

    assert int(state_scan.step) == int(state_seq.step) == K
    for a, b in zip(jax.tree_util.tree_leaves(state_seq.params),
                    jax.tree_util.tree_leaves(state_scan.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )
    for k, v in m_scan.items():
        want = np.mean([float(m[k]) for m in per_step])
        np.testing.assert_allclose(float(v), want, rtol=1e-5)


def test_multi_step_rng_schedule_matches_sequential_split():
    """The rng-consuming variant splits one carried key per inner step —
    identical to a host loop doing key, sub = split(key) per step."""
    import optax

    from fdm_tpu.train import make_multi_step

    cfg = tiny_pipeline()
    (ld, vq_params, fdm_params, motion, template, hidden, style,
     emo) = init_pipeline(cfg)
    tx = optax.sgd(0.01)
    step = make_stage2_step(ld, tx, vq_params, donate=False)

    batches = []
    for i in range(2):
        batches.append({
            "motion": motion + 0.01 * i, "template": template,
            "audio_hidden": hidden, "style_one_hot": style,
            "emotion_one_hot": emo,
        })
    stacked = {
        key: jnp.stack([b[key] for b in batches]) for key in batches[0]
    }

    key0 = jax.random.PRNGKey(42)
    state_seq = create_train_state(fdm_params, tx)
    key = key0
    for b in batches:
        key, sub = jax.random.split(key)
        state_seq, _ = step(state_seq, b, sub)

    # scan the underlying jit with the frozen codec as an ARGUMENT — the
    # production wiring (scanning the closure would bake vq_params into
    # the program as HLO constants)
    multi = make_multi_step(
        step.jitted, needs_rng=True, extra_args=(vq_params,)
    )
    state_scan, _ = multi(create_train_state(fdm_params, tx), stacked, key0)
    # rtol 5e-4: the scanned program fuses differently from the standalone
    # step (measured max rel diff ~3e-5 on CPU) — a WRONG key schedule
    # would produce entirely different dropout/noise draws and parameters,
    # not ppm-level float noise
    for a, b in zip(jax.tree_util.tree_leaves(state_seq.params),
                    jax.tree_util.tree_leaves(state_scan.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        )


def test_stage2_e2e_freeze_extractor_cuts_conv_backward_exactly():
    """stage2_train_loss_e2e stops gradients at the conv-feature boundary
    (the reference freezes the extractor unconditionally,
    models/fdm_vqvae_mead.py:19): conv grads must be EXACTLY zero (the
    backward is cut, not merely masked later by the optimizer), while
    every other gradient leaf matches the unfrozen encode path
    bit-for-bit — the optimization must not change the training math."""
    from fdm_tpu.models import LatentDiffusion

    cfg = tiny_pipeline()
    ld = LatentDiffusion.create(
        cfg, with_audio_encoder=True, allow_tiny_audio_encoder=True
    )
    B, T = 2, 8
    sr_samples = int(T / 25 * 16000)
    key = jax.random.PRNGKey(0)
    motion = jax.random.normal(key, (B, T, cfg.vqvae.in_dim)) * 0.1
    template = jnp.zeros((B, 1, cfg.vqvae.in_dim))
    wav = jax.random.normal(jax.random.PRNGKey(1), (B, sr_samples)) * 0.1
    style = jnp.eye(cfg.fdm.style_classes)[:B]
    emo = jnp.eye(7)[:B]

    vq_params = ld.vqvae.init(jax.random.PRNGKey(2), motion, template, emo)
    audio_params = ld.audio_encoder.init(jax.random.PRNGKey(3), wav)
    hidden = ld.encode_audio(audio_params, wav, T)
    L = T * cfg.fdm.tokens_per_frame
    C = cfg.fdm.feature_dim // cfg.fdm.tokens_per_frame
    fdm_params = ld.fdm.init(
        jax.random.PRNGKey(4), jnp.zeros((B, L, C)),
        jnp.zeros((B,), jnp.int32), hidden, style, emo,
    )
    # the FDM output layer is zero-initialized (reference parity), which
    # blocks ALL upstream gradients at init — perturb the FDM params so
    # real gradient signal reaches the audio encoder
    fdm_params = jax.tree_util.tree_map(lambda x: x + 0.01, fdm_params)
    params = {"fdm": fdm_params, "audio": audio_params}
    loss_key = jax.random.PRNGKey(7)

    def frozen_loss(p):
        return ld.stage2_train_loss_e2e(
            vq_params, p, loss_key, motion, template, wav, style, emo,
        )[0]

    def unfrozen_loss(p):
        # the e2e loss body with freeze_extractor left at its default —
        # mirrors stage2_train_loss_e2e's key split exactly
        sa_key, k = jax.random.split(loss_key)
        h = ld.encode_audio(
            p["audio"], wav, T, specaugment_key=sa_key,
        )
        return ld.stage2_train_loss(
            vq_params, p["fdm"], k, motion, template, h, style, emo,
        )[0]

    g_frozen = jax.grad(frozen_loss)(params)
    g_unfrozen = jax.grad(unfrozen_loss)(params)

    conv_frozen = g_frozen["audio"]["params"]["feature_extractor"]
    conv_unfrozen = g_unfrozen["audio"]["params"]["feature_extractor"]
    for leaf in jax.tree_util.tree_leaves(conv_frozen):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    # the unfrozen path must have NONZERO conv grads, or this test would
    # pass vacuously (e.g. if the loss never touched the audio branch)
    assert any(
        np.abs(np.asarray(leaf)).max() > 0
        for leaf in jax.tree_util.tree_leaves(conv_unfrozen)
    ), "unfrozen conv grads all zero — the comparison is vacuous"

    def drop_conv(g):
        return {
            "fdm": g["fdm"],
            "audio": {"params": {
                k: v for k, v in g["audio"]["params"].items()
                if k != "feature_extractor"
            }},
        }

    a_leaves = jax.tree_util.tree_leaves(drop_conv(g_frozen))
    b_leaves = jax.tree_util.tree_leaves(drop_conv(g_unfrozen))
    assert len(a_leaves) == len(b_leaves)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_profiling_writes_trace(tmp_path):
    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    tx = default_optimizer()
    state = create_train_state(vq_params, tx)
    step = make_stage1_step(ld, tx)
    trainer = Trainer(
        step, state, profile_dir=str(tmp_path / "prof"), profile_steps=(1, 2)
    )
    batches = [_stage1_batch(cfg, seed=s) for s in range(3)]
    trainer.run_epoch(iter(batches), epoch=1)
    import glob

    assert glob.glob(str(tmp_path / "prof" / "**" / "*"), recursive=True)


def test_freeze_mask_is_layout_robust():
    """Path-based freezing: feature_extractor leaves are frozen under
    'audio' at ANY nesting depth; same-named modules elsewhere are not
    (round-1 VERDICT weak item 5)."""
    import numpy as np

    from fdm_tpu.train import freeze_audio_conv_mask

    leaf = lambda: np.zeros(1)
    params = {
        "audio": {"params": {"wrapped": {"feature_extractor": {"k": leaf()},
                                         "proj": {"k": leaf()}}}},
        "fdm": {"params": {"feature_extractor": {"k": leaf()}}},
    }
    mask = freeze_audio_conv_mask(params)
    assert mask["audio"]["params"]["wrapped"]["feature_extractor"]["k"] is False
    assert mask["audio"]["params"]["wrapped"]["proj"]["k"] is True
    # 'feature_extractor' OUTSIDE the audio subtree stays trainable
    assert mask["fdm"]["params"]["feature_extractor"]["k"] is True


def test_run_epoch_means_accumulate_on_device():
    """Epoch means from the Trainer's device-side accumulation must equal
    the per-step means computed on host (the totals are only materialized
    once per epoch now)."""
    import numpy as np

    from fdm_tpu.train import Trainer, TrainState

    class FakeStep:
        def __init__(self):
            self.i = 0

        def __call__(self, state, batch):
            self.i += 1
            return state._replace(step=state.step + 1), {
                "loss": jnp.asarray(float(self.i))
            }

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params={}, opt_state={},
    )
    trainer = Trainer(FakeStep(), state)
    means = trainer.run_epoch([{}, {}, {}], epoch=1)
    np.testing.assert_allclose(means["loss"], (1 + 2 + 3) / 3.0)
    assert means["steps"] == 3


def test_step_logging_is_buffered_not_per_step():
    """With a logger attached the hot loop must NOT convert metrics to host
    floats per step (VERDICT round 2): log_step calls arrive in flushes of
    `log_flush_every` (plus an epoch-end flush), with correct global step
    ids and plain-float values."""
    import numpy as np

    from fdm_tpu.train import Trainer, TrainState

    steps_run = [0]

    class FakeStep:
        def __call__(self, state, batch):
            steps_run[0] += 1
            return state._replace(step=state.step + 1), {
                "loss": jnp.asarray(float(steps_run[0]))
            }

    class CountingLogger:
        def __init__(self):
            self.calls = []  # (steps_run_at_call_time, step_id, value)

        def log_step(self, step, metrics):
            assert isinstance(metrics["loss"], float)
            self.calls.append((steps_run[0], step, metrics["loss"]))

        def log_epoch(self, epoch, means):
            pass

    logger = CountingLogger()
    state = TrainState(
        step=jnp.asarray(10, jnp.int32), params={}, opt_state={},
    )
    trainer = Trainer(
        FakeStep(), state, logger=logger, log_flush_every=2
    )
    trainer.run_epoch([{}] * 5, epoch=1)

    # every step logged exactly once, with step ids continuing from the
    # restored state.step (10) and values matching the step's metrics
    assert [(s, v) for _, s, v in logger.calls] == [
        (11, 1.0), (12, 2.0), (13, 3.0), (14, 4.0), (15, 5.0)
    ]
    # buffering proof: the log call for step 1 only happened once TWO steps
    # had already run (flush threshold), and step 5's at epoch end
    ran_at = [r for r, _, _ in logger.calls]
    assert ran_at == [2, 2, 4, 4, 5]


def test_multi_step_in_body_cast_matches_dispatch_cast():
    """cast_f32_keys moves the device cache's fp16->fp32 cast inside the
    scanned body (one per-step slice transient instead of every in-flight
    chunk at fp32). Same fp16 source bits either way, so the training
    trajectory must be bit-compatible with casting the whole chunk at
    dispatch time."""
    import optax

    from fdm_tpu.train import make_multi_step

    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    tx = optax.adamw(1e-3)
    step = make_stage1_step(ld, tx, donate=False)

    K, B, T = 3, 2, 8
    key = jax.random.PRNGKey(7)
    stacked_f16 = {
        "motion": (jax.random.normal(key, (K, B, T, cfg.vqvae.in_dim))
                   * 0.1).astype(jnp.float16),
        "template": jnp.zeros((K, B, 1, cfg.vqvae.in_dim), jnp.float16),
        "emotion_one_hot": jnp.stack(
            [jnp.eye(7)[jnp.arange(B) % 7]] * K
        ),
    }
    stacked_f32 = {
        k: (v.astype(jnp.float32) if v.dtype == jnp.float16 else v)
        for k, v in stacked_f16.items()
    }

    def fresh_state():
        # the scanned program donates the state; each call needs its own
        # param buffers
        return create_train_state(
            jax.tree_util.tree_map(jnp.copy, vq_params), tx
        )

    plain = make_multi_step(step, needs_rng=False)
    state_a, _ = plain(fresh_state(), stacked_f32, jax.random.PRNGKey(0))
    casting = make_multi_step(
        step, needs_rng=False, cast_f32_keys=("motion", "template")
    )
    state_b, _ = casting(fresh_state(), stacked_f16, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_amsgrad_matches_torch_adamw_amsgrad():
    """default_optimizer(amsgrad=True) reproduces torch AdamW(amsgrad=True)
    — the optimizer every reference stage-1 trainer uses
    (reference train/train_mead_vqvae.py:49)."""
    import torch

    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 3).astype(np.float32)
    grads = [rng.randn(5, 3).astype(np.float32) for _ in range(12)]
    lr, wd = 1e-2, 1e-2

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.AdamW([tw], lr=lr, weight_decay=wd, amsgrad=True)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    tx = default_optimizer(lr, wd, amsgrad=True)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=2e-5, atol=2e-6
    )


def test_amsgrad_stage1_step_trains():
    """The amsgrad optimizer composes with the jitted stage-1 step."""
    cfg = tiny_pipeline()
    ld, vq_params, *_ = init_pipeline(cfg)
    tx = default_optimizer(1e-3, amsgrad=True)
    state = create_train_state(vq_params, tx)
    step = make_stage1_step(ld, tx, donate=False)
    batch = _stage1_batch(cfg)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < losses[0] * 0.95, losses[::5]


def test_run_epoch_weights_multi_step_chunk_means():
    """A (batch, n_steps) multi-step chunk's metrics are the MEAN over its
    scanned steps; run_epoch must weight them by n_steps or the epoch mean
    under-reports by num_chunks/num_steps (the round-5 h2h phantom: 32 b1
    batches in [16, 9, 7] chunks printed recon 10.7x lower than reality)."""
    from fdm_tpu.train import Trainer, TrainState

    # per-step "losses": chunk A covers steps [1..16], B [17..25], C [26..32]
    steps = np.arange(1.0, 33.0)
    chunks = [(steps[:16], 16), (steps[16:25], 9), (steps[25:], 7)]

    class FakeMultiStep:
        def __init__(self):
            self.i = 0

        def __call__(self, state, batch):
            vals, n = chunks[self.i]
            self.i += 1
            return state._replace(step=state.step + n), {
                "loss": jnp.asarray(vals.mean())
            }

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params={}, opt_state={},
    )
    trainer = Trainer(FakeMultiStep(), state)
    means = trainer.run_epoch(
        [(({"x": jnp.zeros(())}), n) for _, n in chunks], epoch=1
    )
    np.testing.assert_allclose(means["loss"], steps.mean())
    assert means["steps"] == 32
