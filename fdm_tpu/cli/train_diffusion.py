"""Stage-2 LG-LDM training CLI: FDM denoiser over the frozen stage-1 codec.

Parity surface: reference train/train_diffusion_mead.py, _vocaset.py,
_biwi.py. TPU-native: audio encoding runs once per clip outside the step,
the step (denoise loss + frozen-codec vertex recon loss + AdamW) is one
jitted program, data-parallel over Mesh(('data',)).

  python -m fdm_tpu.cli.train_diffusion --dataset mead \
      --stage1 checkpoints/stage1/mead_vqvae_params.msgpack
  python -m fdm_tpu.cli.train_diffusion --dataset vocaset --synthetic --tiny
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from fdm_tpu.cli.common import (
    AudioFrontend,
    FlameDecoder,
    add_common_args,
    build_config,
    choose_mesh,
    decode_motion,
    ensure_dir,
    load_params,
    load_splits,
    make_pipeline,
    resume_start_epoch,
    save_params,
    save_progress,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--epochs", type=int, default=None,
                        help="total epoch budget; with --resume the run "
                             "continues toward this total (not N more)")
    parser.add_argument("--stage1", default=None,
                        help="stage-1 params .msgpack (random init if unset)")
    parser.add_argument("--audio_params", default=None,
                        help="audio encoder params .msgpack (random if unset)")
    parser.add_argument("--output_dir", default="checkpoints/stage2")
    parser.add_argument("--flame_model", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="restore the latest orbax checkpoint and "
                             "continue toward --epochs")
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help="EMA of params in the jitted step (0 = off)")
    parser.add_argument("--save_ema", action="store_true",
                        help="save the EMA weights as the final artifact")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="micro-batches per optimizer update")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of early steps")
    parser.add_argument("--fsdp", action="store_true",
                        help="shard params + optimizer state 1/N over the "
                             "data mesh (ZeRO-3) instead of replicating")
    parser.add_argument("--train_audio_encoder", action="store_true",
                        help="fine-tune the audio encoder transformer jointly "
                             "with the FDM (conv extractor frozen) — the "
                             "reference's stage-2 regime (quirk Q10)")
    parser.add_argument("--device_cache", action="store_true",
                        help="pin every collated batch in device memory "
                             "once and reuse across epochs (small datasets "
                             "on transfer-bound links; batch composition "
                             "is fixed, order reshuffles per epoch)")
    parser.add_argument("--device_cache_half", action="store_true",
                        help="store cached float32 data as fp16 (halves "
                             "HBM; matches the reference loaders' own "
                             "fp16 round-trip, quirk Q9)")
    parser.add_argument("--scan_steps", type=int, default=1,
                        help="train steps per device dispatch (lax.scan "
                             "over stacked cached batches; needs "
                             "--device_cache). Cuts per-step host round "
                             "trips K-fold — the bottleneck on degraded "
                             "or high-latency device links")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from fdm_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_config(args)
    epochs = args.epochs if args.epochs is not None else cfg.train.stage2_epochs

    from fdm_tpu.data import batch_iterator
    from fdm_tpu.models import LatentDiffusion
    from fdm_tpu.train import (
        Trainer, accumulating_optimizer, create_train_state,
        default_optimizer, frozen_aware_optimizer, make_stage2_e2e_step,
        make_stage2_step, replicate_state,
    )
    from fdm_tpu.utils.checkpoint import Checkpointer
    from fdm_tpu.utils.logging import MetricLogger

    splits = load_splits(cfg, args, read_audio=True)
    print(f"dataset={cfg.dataset.name} train={len(splits.train)} "
          f"valid={len(splits.valid)} test={len(splits.test)}")
    if not splits.train:
        raise SystemExit("no training records found")

    flame = (
        FlameDecoder(cfg, args.flame_model)
        if cfg.dataset.uses_flame_params else None
    )
    frontend = AudioFrontend(
        cfg, args.audio_params, seed=args.seed,
        allow_tiny=args.tiny or args.synthetic,
    )
    ld = make_pipeline(
        cfg, with_audio_encoder=args.train_audio_encoder,
        allow_tiny_audio_encoder=args.tiny or args.synthetic,
        for_training=True,
    )

    batch0 = _prepare(next(_batches(splits.train, cfg, args, 0)), cfg, flame,
                      frontend, keep_audio=args.train_audio_encoder)
    key = jax.random.PRNGKey(cfg.train.seed)
    if args.stage1:
        vq_params = load_params(args.stage1)
        print(f"loaded frozen stage-1 params from {args.stage1}")
    else:
        vq_params = jax.jit(ld.vqvae.init)(
            key, batch0["motion"], batch0["template"],
            batch0.get("emotion_one_hot"),
        )
    B, T = batch0["motion"].shape[:2]
    L = T * cfg.fdm.tokens_per_frame
    audio_hidden0 = (
        frontend(batch0["audio"], T)
        if args.train_audio_encoder else batch0["audio_hidden"]
    )
    fdm_params = jax.jit(ld.fdm.init)(
        jax.random.PRNGKey(cfg.train.seed + 1),
        jnp.zeros((B, L, cfg.vqvae.zquant_dim)),
        jnp.zeros((B,), jnp.int32),
        audio_hidden0,
        batch0["style_one_hot"],
        batch0.get("emotion_one_hot"),
    )

    mesh = choose_mesh(cfg.train.batch_size)
    if args.fsdp and mesh is None:
        raise SystemExit(
            "--fsdp needs a multi-device mesh (train.batch_size must be "
            "a multiple of the device count)"
        )

    def _place(params):
        if args.fsdp:
            from fdm_tpu.parallel import place_fsdp_params

            return place_fsdp_params(params, mesh)
        return params

    base_tx = accumulating_optimizer(
        default_optimizer(cfg.train.learning_rate, cfg.train.weight_decay),
        args.grad_accum,
    )
    if args.scan_steps > 1 and not args.device_cache:
        raise SystemExit("--scan_steps needs --device_cache (the stacked "
                         "batches must already live on device)")

    def _maybe_scan(step):
        if args.scan_steps <= 1:
            return step
        from fdm_tpu.train import make_multi_step

        # scan the UNDERLYING jit (vq_params as a traced argument): the
        # bound step closes over the frozen codec, and scanning the
        # closure would bake ~the whole codec into the program as HLO
        # constants (remote compile rejects the payload with HTTP 413)
        return make_multi_step(
            step.jitted, needs_rng=True, extra_args=(vq_params,),
            cast_f32_keys=(
                ("motion", "template", "audio")
                if args.device_cache_half else ()
            ),
        )

    # donate=False on the inner step when scanning: the OUTER scanned
    # program owns the state donation
    donate = args.scan_steps <= 1
    if args.train_audio_encoder:
        train_params = _place({"fdm": fdm_params, "audio": frontend.params})
        tx = frozen_aware_optimizer(base_tx, train_params)
        state = create_train_state(train_params, tx, ema_decay=args.ema_decay)
        if mesh is not None and not args.fsdp:
            state = replicate_state(state, mesh)
        step = _maybe_scan(make_stage2_e2e_step(
            ld, tx, vq_params, donate=donate, ema_decay=args.ema_decay
        ))
    else:
        tx = base_tx
        state = create_train_state(
            _place(fdm_params), tx, ema_decay=args.ema_decay
        )
        if mesh is not None and not args.fsdp:
            state = replicate_state(state, mesh)
        step = _maybe_scan(make_stage2_step(
            ld, tx, vq_params, donate=donate, ema_decay=args.ema_decay
        ))

    out_dir = ensure_dir(args.output_dir)
    ckpt = Checkpointer(out_dir + "/orbax", async_save=cfg.train.ckpt_async)
    start_epoch = 0
    if args.resume and ckpt.latest_step() is not None:
        restored = ckpt.restore(target=state)
        # the restore materializes fresh device buffers; the init-time
        # params stay pinned in HBM through fdm_params / frontend.params
        # (~1.4 GB of dead HuBERT weights on the e2e path — the e2e step
        # reads weights from the train state only). Resumed runs otherwise
        # sit one dead parameter set above the fresh-run HBM watermark and
        # OOM where a fresh run fits (observed: deferred RESOURCE_EXHAUSTED
        # one epoch after resume). Delete the stale buffers explicitly.
        if args.train_audio_encoder:
            for leaf in jax.tree_util.tree_leaves(state):
                if isinstance(leaf, jax.Array):
                    leaf.delete()
            frontend.params = None
            train_params = None
        fdm_params = None
        state = restored
        start_epoch = resume_start_epoch(out_dir, int(state.step))
        print(f"resumed from step {int(state.step)} "
              f"(epoch {start_epoch}/{epochs})")
    logger = MetricLogger(cfg.train.log_dir, f"{cfg.dataset.name}_diffusion")
    trainer = Trainer(
        step, state, mesh=mesh, logger=logger, checkpointer=ckpt,
        checkpoint_every=cfg.train.checkpoint_every,
        profile_dir=args.profile,
        rng=jax.random.PRNGKey(cfg.train.seed + 2),
    )

    cache = None
    if args.device_cache:
        from fdm_tpu.data.device_cache import DeviceBatchCache

        cache = DeviceBatchCache.from_records(
            splits.train, cfg.train.batch_size,
            lambda b: _prepare(b, cfg, flame, frontend,
                               keep_audio=args.train_audio_encoder),
            bucket=cfg.train.frame_bucket, max_frames=cfg.train.max_frames,
            fps=cfg.dataset.fps, include_audio=True, seed=args.seed,
            drop_last=jax.device_count() > 1 and cfg.train.batch_size > 1,
            half=args.device_cache_half,
            half_keys=("motion", "template", "audio"),
            max_bytes=12 << 30,
        )
        print(f"device cache: {cache.num_batches} batches, "
              f"{cache.nbytes / 1e9:.2f} GB pinned")

    for epoch in range(start_epoch + 1, epochs + 1):
        if cache is not None and args.scan_steps > 1:
            data = cache.epoch_stacked(
                args.seed + epoch, args.scan_steps,
                cast_back=not args.device_cache_half,
                release_batches=True,
            )
        elif cache is not None:
            data = cache.epoch(args.seed + epoch)
        else:
            data = (
                _prepare(b, cfg, flame, frontend,
                         keep_audio=args.train_audio_encoder)
                for b in _batches(splits.train, cfg, args, epoch)
            )
        means = trainer.run_epoch(data, epoch)
        save_progress(out_dir, epoch, int(trainer.state.step))
        print(f"epoch {epoch}: loss={means.get('loss', float('nan')):.5f} "
              f"denoise={means.get('denoise_loss', float('nan')):.5f} "
              f"recon={means.get('recon_loss', float('nan')):.5f} "
              f"steps/s={means['steps_per_sec']:.2f}")

    # always leave a checkpoint at the final step so chunked --resume runs
    # chain regardless of checkpoint_every alignment
    if ckpt.latest_step() != int(trainer.state.step):
        ckpt.save(int(trainer.state.step), trainer.state)
    final = (
        trainer.state.ema_params
        if args.save_ema and trainer.state.ema_params is not None
        else trainer.state.params
    )
    # with EMA on, export BOTH weight sets (raw params + `*_ema` files) so
    # samplers can be compared on the same run; --save_ema additionally
    # makes the plain files the EMA set (back-compat)
    ema = trainer.state.ema_params if not args.save_ema else None
    if args.train_audio_encoder:
        save_params(f"{out_dir}/{cfg.dataset.name}_fdm_params.msgpack",
                    final["fdm"])
        save_params(f"{out_dir}/{cfg.dataset.name}_audio_params.msgpack",
                    final["audio"])
        if ema is not None:
            save_params(f"{out_dir}/{cfg.dataset.name}_fdm_params_ema.msgpack",
                        ema["fdm"])
            save_params(
                f"{out_dir}/{cfg.dataset.name}_audio_params_ema.msgpack",
                ema["audio"])
    else:
        save_params(f"{out_dir}/{cfg.dataset.name}_fdm_params.msgpack",
                    final)
        if ema is not None:
            save_params(f"{out_dir}/{cfg.dataset.name}_fdm_params_ema.msgpack",
                        ema)
    logger.close()
    ckpt.close()
    return 0


def _batches(records, cfg, args, epoch_seed: int):
    from fdm_tpu.data import batch_iterator

    return batch_iterator(
        records, cfg.train.batch_size, bucket=cfg.train.frame_bucket,
        max_frames=cfg.train.max_frames, fps=cfg.dataset.fps,
        include_audio=True, shuffle=True, seed=args.seed + epoch_seed,
        drop_last=jax.device_count() > 1 and cfg.train.batch_size > 1,
    )


def _prepare(batch, cfg, flame, frontend, keep_audio: bool = False) -> dict:
    batch = decode_motion(cfg, batch, flame)
    if keep_audio:
        # raw waveform stays in the batch; the e2e step encodes it on-device
        # (the frontend's params live inside the donated train state by then)
        return batch
    T = batch["motion"].shape[1]
    # stays a device array: downloading it here only for the jitted step to
    # re-upload it costs a ~1 MB round trip per step over the tunnel
    batch["audio_hidden"] = frontend(batch.pop("audio"), T)
    return batch


if __name__ == "__main__":
    raise SystemExit(main())
