"""Demo CLI: one wav file -> generated vertex animation .npy.

Parity surface: reference demo/demo_3d_mead.py (--audio_file --emotion,
+1 s zero padding, frames = len/sr*fps, 1000-step sample, quantize/decode +
template) with quirks fixed as intent: demo_vocaset.py/demo_biwi.py are MEAD
copy-pastes with undefined variables (quirk Q4) and the output path arg is
missing from the parser (quirk Q5) — here every dataset works and --output is
explicit.

  python -m fdm_tpu.cli.demo --dataset mead --audio_file hello.wav \
      --emotion happy --stage1 s1.msgpack --stage2 s2.msgpack --output out.npy
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from fdm_tpu.cli.common import (
    AudioFrontend,
    add_common_args,
    build_config,
    default_sampler,
    encode_emotion_row,
    emotion_labels,
    ensure_dir,
    load_params,
    make_pipeline,
    resolve_template,
)

EMOTIONS = emotion_labels()


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--audio_file", default=None,
                        help="input wav (16 kHz mono preferred); --synthetic "
                             "generates 2 s of noise instead")
    parser.add_argument("--emotion", default="neutral", choices=EMOTIONS)
    parser.add_argument("--style", type=int, default=0,
                        help="speaker identity index")
    parser.add_argument("--stage1", default=None)
    parser.add_argument("--stage2", default=None)
    parser.add_argument("--audio_params", default=None)
    parser.add_argument("--template_file", default=None,
                        help=".npy vertex template (zeros/FLAME if unset)")
    parser.add_argument("--output", default="results/demo_output.npy")
    parser.add_argument("--sampler", default=None, choices=["ddpm", "ddim"])
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--cfg_scale", type=float, default=None)
    parser.add_argument("--flame_model", default=None)
    parser.add_argument("--render", action="store_true",
                        help="also render the animation to <output stem>.mp4"
                             " — with the input audio muxed in (ffmpeg when "
                             "available, else the dependency-free MJPEG+PCM"
                             " .avi). One command replaces the reference's "
                             "demo + render script pair.")
    parser.add_argument("--render_size", type=int, default=256)
    parser.add_argument("--faces", default=None,
                        help=".npy (F, 3) triangle indices for mesh "
                             "rendering; point splats otherwise")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from fdm_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_config(args)
    sampler = args.sampler or default_sampler(cfg)

    from fdm_tpu.audio.features import (
        frames_for_duration, normalize_waveform, pad_audio,
    )
    from fdm_tpu.data.common import bucket_frames, read_wav
    from fdm_tpu.models import LatentDiffusion

    if args.audio_file:
        wav = read_wav(args.audio_file, target_sr=cfg.dataset.audio_sr)
    elif args.synthetic:
        rng = np.random.RandomState(args.seed)
        wav = normalize_waveform(rng.randn(2 * cfg.dataset.audio_sr) * 0.1)
    else:
        raise SystemExit("--audio_file required (or --synthetic)")
    wav = pad_audio(wav, cfg.dataset.audio_sr, seconds=1.0)

    sr, fps = cfg.dataset.audio_sr, cfg.dataset.fps
    num_frames = frames_for_duration(len(wav), sr, fps)
    T_pad = bucket_frames(num_frames, cfg.train.frame_bucket, cfg.train.max_frames)
    T = min(num_frames, T_pad)

    template = resolve_template(cfg, args.template_file, args.flame_model)

    emotion = None
    if cfg.fdm.emotion_classes:
        emotion = jnp.asarray(encode_emotion_row(cfg, args.emotion))[None]
    style = jnp.eye(cfg.fdm.style_classes)[None, args.style % cfg.fdm.style_classes]

    frontend = AudioFrontend(
        cfg, args.audio_params, seed=args.seed,
        allow_tiny=args.tiny or args.synthetic,
    )
    # +320: one extra conv hop, same as collate_batch — exactly T/fps
    # seconds yields 2T-1 fifty-Hz conv frames, one short at fps=25
    samples = int(T_pad * sr / fps) + 320
    audio = np.zeros((1, samples), np.float32)
    audio[0, : min(len(wav), samples)] = wav[:samples]
    audio_hidden = frontend(audio, T_pad)

    ld = make_pipeline(cfg)
    key = jax.random.PRNGKey(args.seed)
    if args.stage1:
        vq_params = load_params(args.stage1)
    else:
        motion0 = jnp.zeros((1, T_pad, cfg.vqvae.in_dim))
        vq_params = jax.jit(ld.vqvae.init)(
            key, motion0, jnp.asarray(template), emotion
        )
    if args.stage2:
        fdm_params = load_params(args.stage2)
    else:
        L = T_pad * cfg.fdm.tokens_per_frame
        fdm_params = jax.jit(ld.fdm.init)(
            jax.random.PRNGKey(args.seed + 1),
            jnp.zeros((1, L, cfg.vqvae.zquant_dim)),
            jnp.zeros((1,), jnp.int32), audio_hidden, style, emotion,
        )

    # params as jit args, not closure captures (HLO-constant compile blowup)
    generate = jax.jit(
        lambda vq_p, fdm_p, ah, tmpl, k: ld.generate(
            vq_p, fdm_p, k, ah, tmpl, style, emotion, sampler=sampler,
            num_steps=args.steps, cfg_scale=args.cfg_scale,
        )
    )
    verts = np.asarray(
        generate(vq_params, fdm_params, audio_hidden, jnp.asarray(template),
                 jax.random.PRNGKey(args.seed + 2))
    )[0, :T]

    ensure_dir(os.path.dirname(os.path.abspath(args.output)))
    np.save(args.output, verts)
    print(f"wrote {verts.shape} vertices ({T} frames @ {fps} fps, "
          f"emotion={args.emotion}, sampler={sampler}) to {args.output}")

    if args.render:
        from fdm_tpu.render.renderer import render_sequence, write_video

        faces = (
            np.load(args.faces).astype(np.int64) if args.faces else None
        )
        video = os.path.splitext(args.output)[0] + ".mp4"
        rig = "voca" if faces is not None else "ortho"
        n = write_video(
            # camera preset follows the dataset (BIWI's focal length is 4x
            # vocaset's, reference render.py:30-37)
            render_sequence(verts, size=args.render_size, faces=faces,
                            rig=rig, dataset=cfg.dataset.name),
            video, fps=fps, audio_path=args.audio_file,
        )
        print(f"{video}: {n} frames @ {fps} fps")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
