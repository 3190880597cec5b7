"""Stage-1 round-trip sampling CLI: encode -> quantize -> decode the test
split and save reconstructions as .npy.

Parity surface: reference samples/sample_mead_vqvae.py, sample_vocaset_vqvae.py,
sample_biwi_vqvae.py (the minimum end-to-end slice, SURVEY.md §7.4). The whole
round-trip is one jitted XLA program per bucket shape.

  python -m fdm_tpu.cli.sample_vqvae --dataset vocaset \
      --params checkpoints/stage1/vocaset_vqvae_params.msgpack --output_dir out
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from fdm_tpu.cli.common import (
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
    parser.add_argument("--params", default=None,
                        help="stage-1 params .msgpack (random init if unset)")
    parser.add_argument("--output_dir", default="results/vqvae")
    parser.add_argument("--split", default="test", choices=["train", "valid", "test"])
    parser.add_argument("--max_clips", type=int, default=0,
                        help="round-trip only the first N split records "
                             "(0 = all) — gate runs need only the clips "
                             "the correlation CLI will read")
    parser.add_argument("--flame_model", default=None)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from fdm_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_config(args)

    from fdm_tpu.data import collate_batch
    from fdm_tpu.models import LatentDiffusion

    splits = load_splits(cfg, args, read_audio=False)
    records = splits[args.split]
    if not records:
        raise SystemExit(f"no records in split {args.split!r}")
    if args.max_clips and len(records) > args.max_clips:
        records = records[: args.max_clips]
    flame = (
        FlameDecoder(cfg, args.flame_model)
        if cfg.dataset.uses_flame_params else None
    )
    ld = make_pipeline(cfg)

    batch0 = decode_motion(
        cfg,
        collate_batch(records[:1], bucket=cfg.train.frame_bucket,
                      max_frames=cfg.train.max_frames, fps=cfg.dataset.fps),
        flame,
    )
    if args.params:
        vq_params = load_params(args.params)
    else:
        vq_params = jax.jit(ld.vqvae.init)(
            jax.random.PRNGKey(args.seed), batch0["motion"],
            batch0["template"], batch0.get("emotion_one_hot"),
        )

    # params as jit args (closure-captured arrays become HLO constants —
    # pathological compile times for big weight trees)
    @jax.jit
    def _roundtrip(vq_params, motion, template, emotion):
        recon, _, _ = ld.vqvae.apply(vq_params, motion, template, emotion)
        return recon

    def roundtrip(motion, template, emotion):
        return _roundtrip(vq_params, motion, template, emotion)

    out_dir = ensure_dir(args.output_dir)
    total_err, total_n = 0.0, 0
    for rec in records:
        batch = decode_motion(
            cfg,
            collate_batch([rec], bucket=cfg.train.frame_bucket,
                          max_frames=cfg.train.max_frames, fps=cfg.dataset.fps),
            flame,
        )
        T = min(rec.num_frames, cfg.train.max_frames)
        emotion = batch.get("emotion_one_hot")
        recon = roundtrip(
            jnp.asarray(batch["motion"]), jnp.asarray(batch["template"]),
            None if emotion is None else jnp.asarray(emotion),
        )
        recon = np.asarray(recon)[0, :T]
        np.save(os.path.join(out_dir, rec.name + ".npy"), recon)
        gt = np.asarray(batch["motion"])[0, :T]
        total_err += float(np.mean(np.square(recon - gt))) * T
        total_n += T
    print(f"saved {len(records)} reconstructions to {out_dir} "
          f"(mse={total_err / max(total_n, 1):.6e})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
