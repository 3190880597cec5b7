"""Stage-2 sampling CLI: audio -> latent diffusion -> quantize -> decode ->
vertex .npy over the test split.

Parity surface: reference samples/sample_diffusion_mead.py (1000-step
ancestral DDPM), sample_diffusion_vocaset.py (100-step DDIM, looped over all
train-identity conditions), sample_diffusion_biwi.py (50-step DDIM). One CLI:
--sampler/--steps select the sampler, --all_conditions reproduces the
VOCASET/BIWI per-identity loop (outputs ..._condition_<i>.npy).

TPU-native: the audio encoder runs once per clip; the entire denoise loop +
quantize + decode is one jitted scan (generation never leaves the device).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from fdm_tpu.cli.common import (
    AudioFrontend,
    FlameDecoder,
    add_common_args,
    build_config,
    decode_motion,
    ensure_dir,
    load_params,
    load_splits,
    make_pipeline,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--stage1", default=None,
                        help="stage-1 params .msgpack (random init if unset)")
    parser.add_argument("--stage2", default=None,
                        help="FDM params .msgpack (random init if unset)")
    parser.add_argument("--audio_params", default=None)
    parser.add_argument("--output_dir", default="results/diffusion")
    parser.add_argument("--split", default="test",
                        choices=["train", "valid", "test"])
    parser.add_argument("--sampler", default=None, choices=["ddpm", "ddim"],
                        help="default: ddpm for mead, ddim otherwise")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--cfg_scale", type=float, default=None,
                        help="classifier-free guidance scale (0 = off)")
    parser.add_argument("--all_conditions", action="store_true",
                        help="generate once per training identity "
                             "(reference sample_diffusion_vocaset.py:71-73)")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="clips generated per device call (records are "
                             "grouped by bucketed length so batches share "
                             "one compiled shape)")
    parser.add_argument("--dp", action="store_true",
                        help="shard each batch over all visible devices "
                             "(data-parallel sampling; partial batches are "
                             "padded to the device count and the padding "
                             "rows dropped — outputs are identical to the "
                             "single-device run)")
    parser.add_argument("--max_clips", type=int, default=0,
                        help="generate only the first N split records "
                             "(0 = all) — gate runs need only the clips "
                             "the correlation CLI will read")
    parser.add_argument("--flame_model", default=None)
    parser.add_argument("--dump_gt_dir", default=None,
                        help="also save each record's ground-truth vertex "
                             "sequence as <name>.npy here (pairs with the "
                             "metrics CLI's --gt_path; for --synthetic runs "
                             "where no vertices_npy/ ground truth exists)")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from fdm_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_config(args)
    sampler = args.sampler or ("ddpm" if cfg.dataset.name == "mead" else "ddim")
    if (
        sampler == "ddpm" and args.steps
        and args.steps < cfg.diffusion.timesteps
    ):
        print(
            f"warning: ddpm with --steps {args.steps} < "
            f"{cfg.diffusion.timesteps} TRUNCATES the ancestral chain "
            f"(starts from unit noise at t={args.steps - 1}; quality will "
            f"be degraded) — use --sampler ddim for step-count reduction"
        )

    from fdm_tpu.data import collate_batch
    from fdm_tpu.models import LatentDiffusion

    splits = load_splits(cfg, args, read_audio=True)
    records = splits[args.split]
    if not records:
        raise SystemExit(f"no records in split {args.split!r}")
    if args.max_clips and len(records) > args.max_clips:
        records = records[: args.max_clips]
    flame = (
        FlameDecoder(cfg, args.flame_model)
        if cfg.dataset.uses_flame_params else None
    )
    frontend = AudioFrontend(
        cfg, args.audio_params, seed=args.seed,
        allow_tiny=args.tiny or args.synthetic,
    )
    ld = make_pipeline(cfg)

    vq_params, fdm_params = _init_params(ld, cfg, args, records, flame, frontend)

    # --dp: one Mesh over every visible device, params replicated, each
    # batch's leading axis sharded — XLA partitions the whole jitted
    # sampler (denoise scan + quantize + decode) row-wise with no
    # cross-device collectives (generation is independent per clip), so
    # eval sweeps scale linearly over a slice. Same design as the train
    # CLI's DP path (fdm_tpu/parallel/mesh.py); the reference is
    # single-GPU-only here (samples/sample_diffusion_mead.py, SURVEY §2.5).
    mesh = data_sharding = None
    if args.dp:
        if jax.device_count() > 1:
            from fdm_tpu.parallel import (
                batch_sharding,
                make_mesh,
                replicated_sharding,
            )

            mesh = make_mesh()
            vq_params, fdm_params = jax.device_put(
                (vq_params, fdm_params), replicated_sharding(mesh)
            )
            data_sharding = batch_sharding(mesh)
            print(f"--dp: sharding batches over {mesh.devices.size} devices")
        else:
            print("note: --dp with a single visible device is a no-op")

    # params as jit args (closure-captured arrays become HLO constants —
    # pathological compile times for big weight trees)
    @jax.jit
    def _generate(vq_params, fdm_params, key, audio_hidden, template, style,
                  emotion):
        return ld.generate(
            vq_params, fdm_params, key, audio_hidden, template, style,
            emotion, sampler=sampler, num_steps=args.steps,
            cfg_scale=args.cfg_scale,
        )

    def generate(key, audio_hidden, template, style, emotion):
        if data_sharding is not None:
            audio_hidden, template, style = jax.device_put(
                (audio_hidden, template, style), data_sharding
            )
            if emotion is not None:
                emotion = jax.device_put(emotion, data_sharding)
        return _generate(
            vq_params, fdm_params, key, audio_hidden, template, style, emotion
        )

    out_dir = ensure_dir(args.output_dir)
    key = jax.random.PRNGKey(args.seed)
    n_out = 0
    # group records by bucketed length so each device call is one
    # compiled shape with a full batch
    from fdm_tpu.data.common import bucket_frames

    by_len = sorted(
        records,
        key=lambda r: bucket_frames(
            r.num_frames, cfg.train.frame_bucket, cfg.train.max_frames
        ),
    )
    chunks = [
        by_len[i : i + args.batch_size]
        for i in range(0, len(by_len), args.batch_size)
    ]
    gt_dir = ensure_dir(args.dump_gt_dir) if args.dump_gt_dir else None
    # under --dp the leading axis must divide by the mesh size: pad partial
    # chunks by repeating the last record, slice the padding rows off below
    pad_to = mesh.devices.size if mesh is not None else 1
    for chunk in chunks:
        padded = chunk + [chunk[-1]] * ((-len(chunk)) % pad_to)
        batch = decode_motion(
            cfg,
            collate_batch(padded, bucket=cfg.train.frame_bucket,
                          max_frames=cfg.train.max_frames,
                          fps=cfg.dataset.fps, include_audio=True),
            flame,
        )
        T_pad = batch["motion"].shape[1]
        if gt_dir is not None:
            gt = np.asarray(batch["motion"])
            for row, rec in enumerate(chunk):
                np.save(
                    os.path.join(gt_dir, rec.name + ".npy"),
                    gt[row, : min(rec.num_frames, T_pad)],
                )
        audio_hidden = frontend(batch["audio"], T_pad)
        template = jnp.asarray(batch["template"])
        emotion = batch.get("emotion_one_hot")
        emotion = None if emotion is None else jnp.asarray(emotion)

        conditions = (
            list(range(cfg.fdm.style_classes)) if args.all_conditions else [None]
        )
        for cond in conditions:
            style = (
                jnp.asarray(batch["style_one_hot"])
                if cond is None
                else jnp.tile(
                    jnp.eye(cfg.fdm.style_classes)[None, cond],
                    (len(padded), 1),
                )
            )
            key, sub = jax.random.split(key)
            verts = np.asarray(
                generate(sub, audio_hidden, template, style, emotion)
            )
            suffix = "" if cond is None else f"_condition_{cond}"
            for row, rec in enumerate(chunk):
                T = min(rec.num_frames, T_pad)
                np.save(
                    os.path.join(out_dir, rec.name + suffix + ".npy"),
                    verts[row, :T],
                )
                n_out += 1
    print(f"saved {n_out} generations to {out_dir} "
          f"(sampler={sampler}, steps={args.steps or 'default'}, "
          f"batch_size={args.batch_size})")
    return 0


def _init_params(ld, cfg, args, records, flame, frontend):
    from fdm_tpu.data import collate_batch

    batch0 = decode_motion(
        cfg,
        collate_batch(records[:1], bucket=cfg.train.frame_bucket,
                      max_frames=cfg.train.max_frames, fps=cfg.dataset.fps,
                      include_audio=True),
        flame,
    )
    if args.stage1:
        vq_params = load_params(args.stage1)
    else:
        vq_params = jax.jit(ld.vqvae.init)(
            jax.random.PRNGKey(args.seed), batch0["motion"],
            batch0["template"], batch0.get("emotion_one_hot"),
        )
    if args.stage2:
        fdm_params = load_params(args.stage2)
    else:
        B, T = batch0["motion"].shape[:2]
        L = T * cfg.fdm.tokens_per_frame
        fdm_params = jax.jit(ld.fdm.init)(
            jax.random.PRNGKey(args.seed + 1),
            jnp.zeros((B, L, cfg.vqvae.zquant_dim)),
            jnp.zeros((B,), jnp.int32),
            frontend(batch0["audio"], T),
            batch0["style_one_hot"],
            batch0.get("emotion_one_hot"),
        )
    return vq_params, fdm_params


if __name__ == "__main__":
    raise SystemExit(main())
