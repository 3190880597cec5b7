"""Training: donated jitted steps, data-parallel over a device mesh.

Replaces the reference's per-dataset hand-rolled loops
(train/train_*_vqvae.py, train/train_diffusion_*.py — tqdm + .to(device) +
AdamW at lr 1e-4, batch size 1, single GPU) with one trainer:

  * the whole step (loss, grads, optimizer update) is ONE jitted XLA program
    with the state donated (no HBM copy per step);
  * batches are sharded on the leading axis of a Mesh(('data',)); XLA inserts
    the psum for gradient reduction over ICI automatically;
  * checkpointing via orbax (fdm_tpu.utils.checkpoint), metrics as JSONL
    (fdm_tpu.utils.logging) — the reference's TensorBoard scalars have a
    drop-in equivalent writer.
"""

from __future__ import annotations

import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from fdm_tpu.models.pipeline import LatentDiffusion
from fdm_tpu.parallel import replicated_sharding, shard_batch


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None


def create_train_state(params, tx: optax.GradientTransformation,
                       ema_decay: float = 0.0) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        # fresh buffers: aliasing params would double-donate under the jitted
        # step's donate_argnums
        ema_params=(
            jax.tree_util.tree_map(jnp.copy, params) if ema_decay > 0 else None
        ),
    )


def _check_ema(state: "TrainState", ema_decay: float) -> None:
    """ema_decay is configured in two places (create_train_state and the
    step maker); either mismatch is silent — a state carrying ema_params
    with a step built at decay 0 tracks a stale copy, and a step built
    with decay > 0 on a state without ema_params skips the EMA update
    entirely — so both directions fail at trace time."""
    if state.ema_params is not None and ema_decay <= 0.0:
        raise ValueError(
            "state carries ema_params but the train step was built with "
            "ema_decay=0 — pass the same ema_decay to make_*_step"
        )
    if state.ema_params is None and ema_decay > 0.0:
        raise ValueError(
            "train step built with ema_decay > 0 but the state has no "
            "ema_params — pass the same ema_decay to create_train_state"
        )


def _ema_update(ema_params, params, decay: float):
    """Exponential moving average of params (the reference keeps EMA only in
    its vestigial lucidrains Trainer, diffusion_mead_encoder_decoder.py:110-123
    — here it is a first-class option of the jitted step)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )


def default_optimizer(learning_rate: float = 1e-4,
                      weight_decay: float = 1e-2,
                      amsgrad: bool = False) -> optax.GradientTransformation:
    """AdamW matching the reference trainers (lr 1e-4,
    train/train_diffusion_mead.py:49; torch AdamW default weight decay).

    `amsgrad=True` reproduces torch's `AdamW(..., amsgrad=True)` — the
    monotone second-moment cap every reference STAGE-1 trainer uses
    (train_mead_vqvae.py:49, train_biwi_vqvae.py:27,
    train_vocaset_vqvae.py:27; the diffusion trainers use plain AdamW).
    Measured on the 32-clip head-to-head regime this is a large per-step
    convergence lever for the b1 VQ codebook (runs_r5/headtohead/)."""
    scaler = (_scale_by_amsgrad_torch() if amsgrad
              else optax.scale_by_adam())
    return optax.chain(
        scaler,
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


class _AmsgradState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any
    nu_max: Any


def _scale_by_amsgrad_torch(b1: float = 0.9, b2: float = 0.999,
                            eps: float = 1e-8):
    """torch-exact AMSGrad scaling. optax.scale_by_amsgrad takes the
    running max over BIAS-CORRECTED second moments; torch takes the max
    over raw moments and applies the CURRENT step's correction to it
    (torch/optim/adamw.py `amsgrad` branch), which differs on early steps
    — exactly the regime the stage-1 parity targets."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return _AmsgradState(count=jnp.zeros([], jnp.int32), mu=zeros(),
                             nu=zeros(), nu_max=zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, updates)
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        scaled = jax.tree_util.tree_map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm) / jnp.sqrt(bc2) + eps),
            mu, nu_max)
        return scaled, _AmsgradState(count=count, mu=mu, nu=nu,
                                     nu_max=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def make_stage1_step(
    ld: LatentDiffusion,
    tx: optax.GradientTransformation,
    donate: bool = True,
    ema_decay: float = 0.0,
):
    """Jitted VQ-VAE train step: (state, batch) -> (state, metrics).

    batch: dict(motion, template[, emotion_one_hot][, frame_mask])."""

    def step(state: TrainState, batch) -> tuple:
        _check_ema(state, ema_decay)

        def loss_fn(params):
            return ld.stage1_train_loss(
                params,
                batch["motion"],
                batch["template"],
                batch.get("emotion_one_hot"),
                batch.get("frame_mask"),
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            _ema_update(state.ema_params, params, ema_decay)
            if state.ema_params is not None else None
        )
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    return _compile_step(step, donate)


def make_stage2_step(
    ld: LatentDiffusion,
    tx: optax.GradientTransformation,
    vq_params,
    donate: bool = True,
    ema_decay: float = 0.0,
):
    """Jitted diffusion train step over the FDM with the stage-1 codec frozen.

    batch: dict(motion, template, audio_hidden, style_one_hot
                [, emotion_one_hot][, frame_mask]); plus an rng key.

    The frozen codec params enter the jitted step as an ARGUMENT (closure
    capture would bake them into the program as HLO constants — measured
    minutes of extra compile time on remote-compile backends)."""

    def step(state: TrainState, batch, key, vq_params) -> tuple:
        _check_ema(state, ema_decay)

        def loss_fn(fdm_params):
            return ld.stage2_train_loss(
                vq_params,
                fdm_params,
                key,
                batch["motion"],
                batch["template"],
                batch["audio_hidden"],
                batch["style_one_hot"],
                batch.get("emotion_one_hot"),
                batch.get("frame_mask"),
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            _ema_update(state.ema_params, params, ema_decay)
            if state.ema_params is not None else None
        )
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    compiled = _compile_step(step, donate)

    def bound_step(state, batch, key):
        return compiled(state, batch, key, vq_params)

    # expose the underlying jit for AOT inspection (bench.py cost_analysis)
    bound_step.jitted = compiled
    return bound_step


def make_stage2_e2e_step(
    ld: LatentDiffusion,
    tx: optax.GradientTransformation,
    vq_params,
    donate: bool = True,
    ema_decay: float = 0.0,
):
    """Stage-2 step with the audio encoder trained jointly (reference quirk
    Q10). state.params = {"fdm": ..., "audio": ...}; batch carries raw
    "audio" (B, S) instead of "audio_hidden". Combine with
    `freeze_audio_conv_mask` + optax.masked to freeze the conv extractor."""

    def step(state: TrainState, batch, key, vq_params) -> tuple:
        _check_ema(state, ema_decay)

        def loss_fn(params):
            return ld.stage2_train_loss_e2e(
                vq_params,
                params,
                key,
                batch["motion"],
                batch["template"],
                batch["audio"],
                batch["style_one_hot"],
                batch.get("emotion_one_hot"),
                batch.get("frame_mask"),
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            _ema_update(state.ema_params, params, ema_decay)
            if state.ema_params is not None else None
        )
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    compiled = _compile_step(step, donate)

    def bound_step(state, batch, key):
        return compiled(state, batch, key, vq_params)

    # expose the underlying jit for AOT inspection (bench.py cost_analysis)
    bound_step.jitted = compiled
    return bound_step


def freeze_audio_conv_mask(params) -> Any:
    """Boolean mask pytree for optax.masked / multi_transform: False (frozen)
    on the audio conv feature extractor, True elsewhere — the reference
    freezes exactly that subtree (models/fdm_vqvae_mead.py:19,
    feature_extractor._freeze_parameters()).

    Path-based, so it survives pytree layout changes (any leaf whose path
    goes through 'audio' and then 'feature_extractor' is frozen, at any
    nesting depth)."""

    def trainable(path, _leaf):
        keys = [
            getattr(p, "key", getattr(p, "name", None)) for p in path
        ]
        if "audio" not in keys:
            return True
        return "feature_extractor" not in keys[keys.index("audio"):]

    return jax.tree_util.tree_map_with_path(trainable, params)


def frozen_aware_optimizer(
    tx: optax.GradientTransformation, params
) -> optax.GradientTransformation:
    """tx on trainable leaves, zero updates on the frozen audio conv."""
    return optax.multi_transform(
        {True: tx, False: optax.set_to_zero()},
        freeze_audio_conv_mask(params),
    )


def accumulating_optimizer(
    tx: optax.GradientTransformation, every: int
) -> optax.GradientTransformation:
    """Gradient accumulation: average grads over `every` micro-batches, apply
    once (the reference's vestigial Trainer loops gradient_accumulate_every
    backward passes, diffusion_mead_encoder_decoder.py:955-965; here it wraps
    the optimizer so the jitted step is unchanged)."""
    if every <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=every)


def make_multi_step(step_fn: Callable, needs_rng: bool, extra_args=(),
                    cast_f32_keys=()):
    """Scan a train step over K stacked batches in ONE compiled program.

    Per-step host dispatch costs one round trip to the device runtime —
    negligible on local PCIe, but on remote-attached accelerators it IS
    the training bottleneck whenever the link degrades (measured: the
    same stage-2 step at 10 steps/s healthy vs 1.5 steps/s in a degraded
    window, compute unchanged). With the dataset HBM-resident
    (data.DeviceBatchCache) there is no reason to return to the host
    between steps at all: `lax.scan` the step over a (K, ...) stacked
    batch pytree and pay ONE dispatch per K steps.

    `step_fn` is a plain (state, batch[, key][, *extra]) -> (state,
    metrics) step built with donate=False (the OUTER program donates the
    state; inner donation annotations would be dead). The key is split
    once per inner step from the carried key, so K scanned steps consume
    the same number of fresh subkeys as K separate Trainer iterations.
    Returns mean metrics over the K steps.

    `extra_args`: device pytrees the step needs beyond (state, batch,
    key) — e.g. the frozen stage-1 codec of make_stage2_*_step. They
    MUST come in this way: the bound step that closes over them cannot
    be scanned, because the closure capture bakes them into the scanned
    program as HLO constants (a ~200 MB compile payload — the remote
    compile service rejects it outright with HTTP 413; CLAUDE.md fact 1).
    Pass `make_stage2_*_step(...).jitted` as step_fn with
    extra_args=(vq_params,).

    `cast_f32_keys`: batch keys stored fp16 by the device cache
    (DeviceBatchCache half=True) to cast to fp32 INSIDE the scan body.
    Casting whole stacked chunks at dispatch time materializes every
    in-flight chunk at fp32 — with async dispatch that is ~2x the whole
    dataset in transients (the allocation that OOMed the resumed
    full-size stage-2 rehearsal); casting the per-step slice here bounds
    the fp32 transient to one batch inside the compiled program.
    """

    def multi(state, batches, key, *extra):
        def body(carry, batch):
            state, key = carry
            if cast_f32_keys:
                batch = {
                    k: (v.astype(jnp.float32)
                        if k in cast_f32_keys and v.dtype == jnp.float16
                        else v)
                    for k, v in batch.items()
                }
            if needs_rng:
                key, sub = jax.random.split(key)
                state, metrics = step_fn(state, batch, sub, *extra)
            else:
                state, metrics = step_fn(state, batch, *extra)
            return (state, key), metrics

        (state, _), metrics = jax.lax.scan(body, (state, key), batches)
        return state, jax.tree_util.tree_map(
            lambda m: jnp.mean(m, axis=0), metrics
        )

    multi_jit = jax.jit(multi, donate_argnums=(0,))

    def bound(state, batches, key):
        return multi_jit(state, batches, key, *extra_args)

    return bound


def _compile_step(step: Callable, donate: bool):
    """Sharding is carried by the data: `replicate_state` pins the state
    replicated over the mesh and `shard_batch` shards batches on the leading
    axis; jit then partitions the step (gradient psum over 'data') from the
    input shardings — no per-pytree in_shardings spec or mesh argument
    needed (a mesh= kwarg here would be dead weight that LOOKS like it
    constrains placement but doesn't)."""
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def replicate_state(state: TrainState, mesh) -> TrainState:
    """Place every array of the train state replicated over the mesh."""
    repl = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)


class Trainer:
    """Host-side epoch driver: iterates a data source, runs the jitted step,
    logs metrics, checkpoints periodically. Any iterable of batch dicts works
    as a data source (see fdm_tpu.data)."""

    def __init__(
        self,
        step_fn: Callable,
        state: TrainState,
        mesh=None,
        logger=None,
        checkpointer=None,
        checkpoint_every: int = 5,
        rng: Optional[jax.Array] = None,
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (2, 5),
        log_flush_every: int = 64,
    ):
        self.step_fn = step_fn
        self.state = state
        self.mesh = mesh
        self.logger = logger
        self.checkpointer = checkpointer
        self.checkpoint_every = checkpoint_every
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.needs_rng = None  # inferred on first batch
        # per-step metrics are buffered as DEVICE arrays and converted for
        # the logger only every `log_flush_every` steps (and at epoch end):
        # float()-ing each step's metrics would block the host on every
        # step's result and serialize collation with compute
        self.log_flush_every = max(1, log_flush_every)
        # jax.profiler trace of steps [start, stop) in epoch 1 (step 1 is
        # the compile; SURVEY.md §5.1 — the reference has no tracing at all)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self._profiling = False

    def run_epoch(self, data_iter, epoch: int) -> dict:
        totals, count = {}, 0
        # buffered (state.step device scalar, device metrics) pairs awaiting
        # the logger — carrying the step array itself keeps ids exact for
        # ANY step_fn (grad accumulation, skipped updates, ...) without a
        # host sync on the hot path
        pending = []
        t0 = time.perf_counter()
        for item in data_iter:
            # a (batch, n_steps) tuple is a multi-step stack: the step_fn is
            # a make_multi_step product running n_steps scanned steps in one
            # dispatch (data.DeviceBatchCache.epoch_stacked)
            if isinstance(item, tuple):
                batch, n_steps = item
            else:
                batch, n_steps = item, 1
            self._maybe_profile(epoch, count)
            if self.mesh is not None:
                batch = shard_batch(
                    batch, self.mesh, scan_leading=isinstance(item, tuple)
                )
            if self.needs_rng is None:
                self.needs_rng = _step_takes_rng(self.step_fn)
            if self.needs_rng:
                self.rng, sub = jax.random.split(self.rng)
                self.state, metrics = self.step_fn(self.state, batch, sub)
            else:
                self.state, metrics = self.step_fn(self.state, batch)
            count += n_steps
            # accumulate on device (jnp add dispatches async); float()-ing
            # per step would block the host on every step's result and
            # serialize collation with compute. A multi-step chunk's
            # metrics are the MEAN over its n_steps scanned steps, so
            # weight by n_steps — summing raw chunk means and dividing by
            # total steps under-reported every scan-dispatch epoch metric
            # by (num_chunks/num_steps), e.g. 10.7x at 32 b1 batches in
            # [16,9,7] chunks (the round-5 h2h diagnosis artifact).
            for k, v in metrics.items():
                w = v * n_steps if n_steps > 1 else v
                totals[k] = totals[k] + w if k in totals else w
            if self.logger is not None:
                # jnp.copy: the next step call DONATES self.state, which
                # would invalidate the buffered step buffer before flush
                pending.append((jnp.copy(self.state.step), metrics))
                if len(pending) >= self.log_flush_every:
                    self._flush_step_logs(pending)
                    pending = []
        if self.logger is not None and pending:
            self._flush_step_logs(pending)
        elapsed = time.perf_counter() - t0
        means = {k: float(v) / max(count, 1) for k, v in totals.items()}
        means["epoch"] = epoch
        means["steps"] = count
        means["steps_per_sec"] = count / elapsed if elapsed > 0 else 0.0
        if self.logger is not None:
            self.logger.log_epoch(epoch, means)
        if self._profiling:
            # drain async-dispatched steps first or the trace truncates
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
            self._profiling = False
        if (
            self.checkpointer is not None
            and epoch % self.checkpoint_every == 0
        ):
            self.checkpointer.save(int(self.state.step), self.state)
        return means

    def _flush_step_logs(self, pending: list):
        """Convert a batch of buffered (step, metrics) device arrays with
        ONE device_get and forward them to the logger."""
        host = jax.device_get(pending)
        for step, m in host:
            self.logger.log_step(
                int(step), {k: float(v) for k, v in m.items()}
            )

    def _maybe_profile(self, epoch: int, step_in_epoch: int):
        if self.profile_dir is None or epoch != 1:
            return
        start, stop = self.profile_steps
        if step_in_epoch == start and not self._profiling:
            jax.block_until_ready(self.state.params)
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
        elif step_in_epoch == stop and self._profiling:
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
            self._profiling = False


def _step_takes_rng(step_fn) -> bool:
    """True when step_fn has a third REQUIRED positional parameter (the
    PRNG key slot of make_stage*_step functions). Counting every parameter
    would silently bind the key to an unrelated keyword like
    `deterministic=True` on custom steps."""
    try:
        import inspect

        params = list(inspect.signature(step_fn).parameters.values())
        positional = [
            p for p in params
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
            and p.default is p.empty
        ]
        return len(positional) >= 3
    except (TypeError, ValueError):
        return True
