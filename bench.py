"""Headline benchmark: end-to-end audio->vertices real-time factor (RTF) for
the flagship 3D MEAD pipeline with the reference's inference configuration
(full 1000-step ancestral DDPM) on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no wall-clock numbers (BASELINE.md); the quantitative
target is the BASELINE.json north star: RTF < 0.1x real time for the FULL
denoise loop on a single v5e chip. We report
  value       = measured RTF (generation seconds per second of audio)
  vs_baseline = 0.1 / value  (>1 == faster than the target; higher is better)

The timed region is the complete on-device pipeline from raw waveform to
vertices, ONE compiled XLA program: HuBERT-large audio encoding (24-layer
transformer; the reference re-runs this inside every one of its 1000 denoise
steps, reference models/fdm_vqvae_mead.py:70 — here it runs once) -> 50 Hz ->
24 fps frame pairing -> steps x FDM denoise (lax.scan) -> EVQ quantize ->
decode -> +template.

--fused uses the Pallas fused causal-ALiBi attention kernel in the denoiser
(identical math; see fdm_tpu/kernels/attention.py).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def build(seconds: float, steps: int, fused: bool = False,
          include_audio_encoder: bool = True, dtype: str = "float32"):
    from fdm_tpu.audio import AudioEncoder, pair_frames
    from fdm_tpu.audio.encoder import get_encoder_config
    from fdm_tpu.configs import get_config
    from fdm_tpu.models import LatentDiffusion

    cfg = get_config("mead")
    fps = cfg.dataset.fps
    sr = cfg.dataset.audio_sr
    T = int(seconds * fps)
    ld = LatentDiffusion.create(
        cfg, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        self_attn_mode="fused" if fused else "table",
    )

    B = 1
    template = jnp.zeros((B, 1, cfg.vqvae.in_dim))
    style = jnp.eye(cfg.fdm.style_classes)[:B]
    emo = jnp.eye(cfg.fdm.emotion_classes)[:B]

    motion0 = jnp.zeros((B, T, cfg.vqvae.in_dim))
    vq_params = jax.jit(ld.vqvae.init)(
        jax.random.PRNGKey(1), motion0, template, emo
    )
    L = T * cfg.fdm.tokens_per_frame
    C = cfg.vqvae.zquant_dim
    pair = cfg.fdm.audio_pair_factor
    audio_hidden0 = jnp.zeros((B, T, cfg.fdm.audio_dim * pair))
    fdm_params = jax.jit(ld.fdm.init)(
        jax.random.PRNGKey(2), jnp.zeros((B, L, C)),
        jnp.zeros((B,), jnp.int32), audio_hidden0, style, emo,
    )

    # params/inputs are jit ARGUMENTS, never closure captures: a captured
    # device array is baked into the program as an HLO constant, and on this
    # backend serializing ~10^8 weight literals into the compile RPC takes
    # minutes (measured: 8 min for the denoise scan alone) vs seconds as
    # parameters.
    if include_audio_encoder:
        encoder = AudioEncoder(get_encoder_config(cfg.fdm.audio_encoder))
        # pad so the conv stack yields >= 2T frames at ~50 Hz (320-sample hop)
        num_samples = int(seconds * sr) + sr
        enc_params = jax.jit(encoder.init)(
            jax.random.PRNGKey(3), jnp.zeros((B, 6400))
        )
        wav = jax.random.normal(
            jax.random.PRNGKey(4), (B, num_samples), jnp.float32
        )

        @jax.jit
        def _generate(enc_params, vq_params, fdm_params, wav, k):
            hidden = encoder.apply(enc_params, wav, even_trim=False)
            audio_hidden = pair_frames(hidden, pair)[:, :T]
            return ld.generate(
                vq_params, fdm_params, k, audio_hidden, template, style,
                emo, sampler="ddpm", num_steps=steps,
            )

        def generate(k):
            return _generate(enc_params, vq_params, fdm_params, wav, k)
    else:
        audio_hidden = jax.random.normal(
            jax.random.PRNGKey(4), (B, T, cfg.fdm.audio_dim * pair)
        )

        @jax.jit
        def _generate(vq_params, fdm_params, audio_hidden, k):
            return ld.generate(
                vq_params, fdm_params, k, audio_hidden, template, style,
                emo, sampler="ddpm", num_steps=steps,
            )

        def generate(k):
            return _generate(vq_params, fdm_params, audio_hidden, k)

    return generate


def main():
    from fdm_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="audio clip length the pipeline animates")
    ap.add_argument("--steps", type=int, default=1000,
                    help="DDPM denoise steps (reference MEAD: 1000)")
    ap.add_argument("--quick", action="store_true",
                    help="reduced steps/length smoke run")
    ap.add_argument("--fused", action="store_true",
                    help="Pallas fused-attention denoiser")
    ap.add_argument("--no_audio_encoder", action="store_true",
                    help="exclude HuBERT from the timed region")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (fp32 is the parity default)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    if args.quick:
        args.seconds, args.steps, args.repeats = 2.0, 50, 1

    generate = build(
        args.seconds, args.steps, fused=args.fused,
        include_audio_encoder=not args.no_audio_encoder,
        dtype=args.dtype,
    )

    # compile + warmup
    out = generate(jax.random.PRNGKey(0))
    out.block_until_ready()

    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        out = generate(jax.random.PRNGKey(i + 1))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)

    gen_time = min(times)
    rtf = gen_time / args.seconds
    target = 0.1
    print(
        json.dumps(
            {
                "metric": f"mead_e2e_ddpm{args.steps}_rtf_v5e1",
                "value": round(rtf, 5),
                "unit": "x_realtime (lower is better)",
                "vs_baseline": round(target / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
