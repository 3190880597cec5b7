"""Stage-1 (E)VQ-VAE training CLI.

Parity surface: reference train/train_mead_vqvae.py, train_vocaset_vqvae.py,
train_biwi_vqvae.py — one CLI parameterized by --dataset. TPU-native: the
whole step is one jitted program, data-parallel over Mesh(('data',)) when
more than one device is visible; FLAME params decode to vertices on device
for MEAD (no chunk-of-8 host loop).

  python -m fdm_tpu.cli.train_vqvae --dataset mead --data_root /data/mead
  python -m fdm_tpu.cli.train_vqvae --dataset vocaset --synthetic --tiny
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from fdm_tpu.cli.common import (
    FlameDecoder,
    add_common_args,
    build_config,
    choose_mesh,
    decode_motion,
    ensure_dir,
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
    parser.add_argument("--output_dir", default="checkpoints/stage1")
    parser.add_argument("--flame_model", default=None,
                        help="FLAME generic_model.pkl (MEAD; synthetic if unset)")
    parser.add_argument("--resume", action="store_true",
                        help="restore the latest orbax checkpoint and "
                             "continue toward --epochs")
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help="EMA of params in the jitted step (0 = off)")
    parser.add_argument("--save_ema", action="store_true",
                        help="save the EMA weights as the final artifact")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="micro-batches per optimizer update")
    parser.add_argument("--fsdp", action="store_true",
                        help="shard params + optimizer state 1/N over the "
                             "data mesh (ZeRO-3) instead of replicating")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of early steps")
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
    epochs = args.epochs if args.epochs is not None else cfg.train.stage1_epochs

    from fdm_tpu.data import batch_iterator
    from fdm_tpu.models import LatentDiffusion
    from fdm_tpu.train import (
        Trainer, accumulating_optimizer, create_train_state, default_optimizer, make_stage1_step,
        replicate_state,
    )
    from fdm_tpu.utils.checkpoint import Checkpointer
    from fdm_tpu.utils.logging import MetricLogger

    splits = load_splits(cfg, args, read_audio=False)
    print(f"dataset={cfg.dataset.name} train={len(splits.train)} "
          f"valid={len(splits.valid)} test={len(splits.test)}")
    if not splits.train:
        raise SystemExit("no training records found")

    flame = (
        FlameDecoder(cfg, args.flame_model)
        if cfg.dataset.uses_flame_params else None
    )
    ld = make_pipeline(cfg, for_training=True)

    # init params from one representative batch
    first = _batches(splits.train, cfg, args, epoch_seed=0)
    batch0 = decode_motion(cfg, next(first), flame)
    vq_params = jax.jit(ld.vqvae.init)(
        jax.random.PRNGKey(cfg.train.seed),
        batch0["motion"], batch0["template"], batch0.get("emotion_one_hot"),
    )
    out_dir = ensure_dir(args.output_dir)
    ckpt = Checkpointer(out_dir + "/orbax", async_save=cfg.train.ckpt_async)
    will_resume = args.resume and ckpt.latest_step() is not None
    if cfg.train.stage1_codebook_init == "sample" and not will_resume:
        vq_params = _sample_init_codebook(ld, cfg, args, vq_params, splits,
                                          flame)

    mesh = choose_mesh(cfg.train.batch_size)
    tx = accumulating_optimizer(
        default_optimizer(cfg.train.learning_rate, cfg.train.weight_decay,
                          amsgrad=cfg.train.stage1_amsgrad),
        args.grad_accum,
    )
    if args.fsdp:
        if mesh is None:
            raise SystemExit(
                "--fsdp needs a multi-device mesh (train.batch_size must "
                "be a multiple of the device count)"
            )
        from fdm_tpu.parallel import place_fsdp_params

        vq_params = place_fsdp_params(vq_params, mesh)
    state = create_train_state(vq_params, tx, ema_decay=args.ema_decay)
    if mesh is not None and not args.fsdp:
        state = replicate_state(state, mesh)
    if args.scan_steps > 1 and not args.device_cache:
        raise SystemExit("--scan_steps needs --device_cache (the stacked "
                         "batches must already live on device)")
    if args.scan_steps > 1:
        from fdm_tpu.train import make_multi_step

        # donate=False on the inner step: the OUTER scanned program owns
        # the state donation
        step = make_multi_step(
            make_stage1_step(ld, tx, donate=False,
                             ema_decay=args.ema_decay),
            needs_rng=False,
            cast_f32_keys=(
                ("motion", "template", "audio")
                if args.device_cache_half else ()
            ),
        )
    else:
        step = make_stage1_step(ld, tx, ema_decay=args.ema_decay)
    # built ONCE: re-jitting per eval epoch would discard the trace cache
    # and re-trace (or fully recompile on a cold disk cache) every bucket
    # shape at every evaluation
    eval_loss_fn = jax.jit(
        lambda p, motion, template, emo, mask: ld.stage1_train_loss(
            p, motion, template, emo, mask
        )[1]["recon_loss"]
    )

    start_epoch = 0
    if will_resume:
        state = ckpt.restore(target=state)
        start_epoch = resume_start_epoch(out_dir, int(state.step))
        print(f"resumed from step {int(state.step)} "
              f"(epoch {start_epoch}/{epochs})")
    logger = MetricLogger(cfg.train.log_dir, f"{cfg.dataset.name}_vqvae")
    trainer = Trainer(
        step, state, mesh=mesh, logger=logger, checkpointer=ckpt,
        checkpoint_every=cfg.train.checkpoint_every,
        profile_dir=args.profile,
        rng=jax.random.PRNGKey(cfg.train.seed),
    )

    cache = None
    if args.device_cache:
        from fdm_tpu.data.device_cache import DeviceBatchCache

        cache = DeviceBatchCache.from_records(
            splits.train, cfg.train.batch_size,
            lambda b: decode_motion(cfg, b, flame),
            bucket=cfg.train.frame_bucket, max_frames=cfg.train.max_frames,
            fps=cfg.dataset.fps, include_audio=False, seed=args.seed,
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
                decode_motion(cfg, b, flame)
                for b in _batches(splits.train, cfg, args, epoch_seed=epoch)
            )
        means = trainer.run_epoch(data, epoch)
        save_progress(out_dir, epoch, int(trainer.state.step))
        print(f"epoch {epoch}: loss={means.get('loss', float('nan')):.5f} "
              f"recon={means.get('recon_loss', float('nan')):.5f} "
              f"steps/s={means['steps_per_sec']:.2f}")
        if epoch % cfg.train.eval_every == 0 and splits.valid:
            val = _evaluate(
                eval_loss_fn, trainer.state.params, splits.valid, cfg, args,
                flame,
            )
            print(f"epoch {epoch}: val_recon={val:.5f}")
            logger.log_epoch(epoch, {"val_recon": val})

    # always leave a checkpoint at the final step so chunked --resume runs
    # chain regardless of checkpoint_every alignment
    if ckpt.latest_step() != int(trainer.state.step):
        ckpt.save(int(trainer.state.step), trainer.state)
    final = (
        trainer.state.ema_params
        if args.save_ema and trainer.state.ema_params is not None
        else trainer.state.params
    )
    save_params(f"{out_dir}/{cfg.dataset.name}_vqvae_params.msgpack", final)
    logger.close()
    ckpt.close()
    return 0


def _sample_init_codebook(ld, cfg, args, vq_params, splits, flame):
    """Seed the codebook from encoder-output tokens (train.stage1_codebook_init
    ="sample"; see fdm_tpu/codec/quantizer.py:sample_codebook_init for the
    rationale). Runs the encoder on the host CPU backend so short training
    runs pay no extra device compiles."""
    import jax.numpy as jnp

    from fdm_tpu.codec.quantizer import sample_codebook_init

    host = jax.device_get(vq_params)
    toks, emos = [], []
    need = 4 * cfg.vqvae.n_embed
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for batch in _batches(splits.train, cfg, args, epoch_seed=0,
                              drop_last=False):
            batch = jax.device_get(decode_motion(cfg, batch, flame))
            z = ld.vqvae.apply(
                host,
                jnp.asarray(batch["motion"]) - jnp.asarray(batch["template"]),
                batch.get("emotion_one_hot"),
                batch.get("frame_mask"),
                method="encode",
            )
            z = np.asarray(z, np.float32)
            B, L, D = z.shape
            fm = batch.get("frame_mask")
            if fm is not None:
                keep = np.asarray(
                    ld._token_mask(jnp.asarray(fm))
                ).reshape(B * L).astype(bool)
            else:
                keep = np.ones(B * L, bool)
            eo = batch.get("emotion_one_hot")
            if eo is not None:
                emos.append(
                    np.repeat(np.argmax(np.asarray(eo), -1), L)[keep]
                )
            toks.append(z.reshape(B * L, D)[keep])
            if sum(map(len, toks)) >= need:
                break
    codebook = sample_codebook_init(
        jax.random.PRNGKey(cfg.train.seed + 1),
        np.concatenate(toks, axis=0),
        (cfg.vqvae.n_embed, cfg.vqvae.zquant_dim),
        emotion_ids=np.concatenate(emos, axis=0) if emos else None,
        partitions=cfg.vqvae.emotion_classes,
    )
    import flax.core

    p = flax.core.unfreeze(vq_params)
    p["params"]["codebook"] = codebook
    out = (
        flax.core.freeze(p)
        if isinstance(vq_params, flax.core.FrozenDict) else p
    )
    print(f"codebook init: sampled {cfg.vqvae.n_embed} entries from "
          f"{sum(map(len, toks))} encoder tokens")
    return out


def _batches(records, cfg, args, epoch_seed: int, drop_last=None):
    from fdm_tpu.data import batch_iterator

    if drop_last is None:
        drop_last = jax.device_count() > 1 and cfg.train.batch_size > 1
    return batch_iterator(
        records, cfg.train.batch_size, bucket=cfg.train.frame_bucket,
        max_frames=cfg.train.max_frames, fps=cfg.dataset.fps,
        include_audio=False, shuffle=True, seed=args.seed + epoch_seed,
        drop_last=drop_last,
    )


def _evaluate(loss_fn, params, records, cfg, args, flame) -> float:
    total, n = 0.0, 0
    # evaluation runs single-program per batch (no mesh): never drop the
    # remainder — with few valid records, drop_last could discard EVERY
    # batch and a 0/1 division would then report a perfect val_recon=0.0
    for batch in _batches(records, cfg, args, epoch_seed=0, drop_last=False):
        batch = decode_motion(cfg, batch, flame)
        total += float(loss_fn(
            params, batch["motion"], batch["template"],
            batch.get("emotion_one_hot"), batch.get("frame_mask"),
        ))
        n += 1
    return total / n if n else float("nan")


if __name__ == "__main__":
    raise SystemExit(main())
