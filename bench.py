"""Driver benchmark: per-dataset end-to-end inference RTF + training
throughput on one TPU chip.

Prints one JSON line PER METRIC:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
The flagship metric (MEAD e2e DDPM-1000 RTF — the reference's headline
inference configuration) is printed LAST so single-line consumers read it.

Suites (reference configs per BASELINE.md):
  mead    : HuBERT-large + 1000-step ancestral DDPM + EVQ decode, 24 fps
            (diffusion_mead_encoder_decoder.py:663-665)
  biwi    : wav2vec2-base + 50-step DDIM + 70110-dim decode, 25 fps
            (samples/sample_diffusion_biwi.py:72)
  vocaset : HuBERT-large @30fps interp + 100-step DDIM, 16 tok/frame
            (samples/sample_diffusion_vocaset.py:80)
  train   : full-size MEAD stage-2 e2e step (HuBERT inside the program,
            joint FDM+encoder training, frozen conv+codec), steps/s + MFU

The timed inference region is the complete on-device pipeline from raw
waveform to vertices in ONE compiled XLA program: audio encoding (the
reference re-runs its audio encoder inside every denoise step, reference
models/fdm_vqvae_mead.py:70 — here it runs once) -> frame alignment ->
steps x FDM denoise (lax.scan) -> quantize -> decode -> +template.

RTF target (BASELINE.json): < 0.1x real time => vs_baseline = 0.1 / RTF.
Training has no reference number (1x GPU, batch 1, no wall-clock published);
vs_baseline is steps/s against a 1.0 steps/s engineering target.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

PEAK_BF16_FLOPS_V5E = 197e12  # one v5e chip, bf16 systolic peak


def build_generate(dataset: str, sampler: str, steps: int, seconds: float,
                   fused: bool = False, dtype: str = "float32",
                   batch_size: int = 1):
    """Waveform->vertices pipeline for one dataset preset, audio encoder
    included in the compiled program. Returns (generate_fn, seconds)."""
    from fdm_tpu.configs import get_config
    from fdm_tpu.models import LatentDiffusion

    cfg = get_config(dataset)
    fps = cfg.dataset.fps
    sr = cfg.dataset.audio_sr
    T = int(seconds * fps)
    ld = LatentDiffusion.create(
        cfg, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        self_attn_mode="fused" if fused else "table",
        with_audio_encoder=True,
    )

    B = batch_size
    template = jnp.zeros((B, 1, cfg.vqvae.in_dim))
    style = jnp.eye(cfg.fdm.style_classes)[
        jnp.arange(B) % cfg.fdm.style_classes
    ]
    emo = (
        jnp.eye(cfg.fdm.emotion_classes)[
            jnp.arange(B) % cfg.fdm.emotion_classes
        ]
        if cfg.fdm.emotion_classes else None
    )

    motion0 = jnp.zeros((B, 8, cfg.vqvae.in_dim))
    vq_params = jax.jit(ld.vqvae.init)(
        jax.random.PRNGKey(1), motion0, template[:, :1], emo
    )
    L = T * cfg.fdm.tokens_per_frame
    C = cfg.vqvae.zquant_dim
    pair = cfg.fdm.audio_pair_factor
    audio_hidden0 = jnp.zeros((B, T, cfg.fdm.audio_dim * pair))
    fdm_params = jax.jit(ld.fdm.init)(
        jax.random.PRNGKey(2), jnp.zeros((B, L, C)),
        jnp.zeros((B,), jnp.int32), audio_hidden0, style, emo,
    )
    # +1 s zero-style pad like the reference demos so the conv stack yields
    # enough 50 Hz frames for pairing/interp
    num_samples = int(seconds * sr) + sr
    enc_params = jax.jit(ld.audio_encoder.init)(
        jax.random.PRNGKey(3), jnp.zeros((B, 6400))
    )
    wav = jax.random.normal(
        jax.random.PRNGKey(4), (B, num_samples), jnp.float32
    )

    # params/inputs are jit ARGUMENTS, never closure captures: a captured
    # device array is baked into the program as an HLO constant, and on this
    # backend serializing ~10^8 weight literals into the compile RPC takes
    # minutes (measured: 8 min for the denoise scan alone) vs seconds as
    # parameters.
    @jax.jit
    def _generate(enc_params, vq_params, fdm_params, wav, k):
        audio_hidden = ld.encode_audio(enc_params, wav, T)
        return ld.generate(
            vq_params, fdm_params, k, audio_hidden, template, style,
            emo, sampler=sampler, num_steps=steps,
        )

    def generate(k):
        return _generate(enc_params, vq_params, fdm_params, wav, k)

    return generate


def bench_rtf(dataset, sampler, steps, seconds, repeats, fused, dtype,
              batch_size=1):
    """Per-clip real-time factor: wall / (batch_size * clip_seconds).

    batch_size > 1 is batched offline generation — the reference can only
    run one clip at a time (batch 1 everywhere); batching the whole
    pipeline amortizes the sequential denoise steps across clips on the
    MXU. Per-clip RTF keeps both cases comparable against the 0.1x target.
    """
    generate = build_generate(
        dataset, sampler, steps, seconds, fused, dtype, batch_size
    )
    out = generate(jax.random.PRNGKey(0))  # compile + warmup
    out.block_until_ready()
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        out = generate(jax.random.PRNGKey(i + 1))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    rtf = min(times) / (seconds * batch_size)
    tag = f"_b{batch_size}_per_clip" if batch_size > 1 else ""
    return {
        "metric": f"{dataset}_e2e_{sampler}{steps}{tag}_rtf_v5e1",
        "value": round(rtf, 5),
        "unit": (
            "x_realtime per clip (lower is better)" if batch_size > 1
            else "x_realtime (lower is better)"
        ),
        "vs_baseline": round(0.1 / rtf, 3),
    }


def bench_train_step(seconds=5.0, repeats=20, dtype="float32",
                     batch_size=1):
    """Full-size MEAD stage-2 e2e train step (joint FDM + HuBERT-large
    transformer, frozen conv extractor + codec). batch_size=1 is the
    reference regime; larger batches show the MXU utilization the
    reference's batch-1 loop can never reach."""
    from fdm_tpu.configs import get_config
    from fdm_tpu.models import LatentDiffusion
    from fdm_tpu.train import (
        create_train_state, default_optimizer, frozen_aware_optimizer,
        make_stage2_e2e_step,
    )

    cfg = get_config("mead")
    ld = LatentDiffusion.create(
        cfg, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        with_audio_encoder=True,
    )
    B = batch_size
    T = int(seconds * cfg.dataset.fps)
    sr = cfg.dataset.audio_sr
    key = jax.random.PRNGKey(0)
    motion = jax.random.normal(key, (B, T, cfg.vqvae.in_dim)) * 0.01
    template = jnp.zeros((B, 1, cfg.vqvae.in_dim))
    wav = jax.random.normal(
        jax.random.PRNGKey(1), (B, int(seconds * sr) + sr)
    ) * 0.1
    style = jnp.eye(cfg.fdm.style_classes)[
        jnp.arange(B) % cfg.fdm.style_classes
    ]
    emo = jnp.eye(cfg.fdm.emotion_classes)[
        jnp.arange(B) % cfg.fdm.emotion_classes
    ]

    vq_params = jax.jit(ld.vqvae.init)(
        jax.random.PRNGKey(2), motion[:, :8], template, emo
    )
    enc_params = jax.jit(ld.audio_encoder.init)(
        jax.random.PRNGKey(3), jnp.zeros((B, 6400))
    )
    audio_hidden = jax.jit(
        lambda p, w: ld.encode_audio(p, w, T)
    )(enc_params, wav)
    L = T * cfg.fdm.tokens_per_frame
    C = cfg.vqvae.zquant_dim
    fdm_params = jax.jit(ld.fdm.init)(
        jax.random.PRNGKey(4), jnp.zeros((B, L, C)),
        jnp.zeros((B,), jnp.int32), audio_hidden, style, emo,
    )

    params = {"fdm": fdm_params, "audio": enc_params}
    tx = frozen_aware_optimizer(default_optimizer(), params)
    state = create_train_state(params, tx)
    step = make_stage2_e2e_step(ld, tx, vq_params)
    batch = {
        "motion": motion, "template": template, "audio": wav,
        "style_one_hot": style, "emotion_one_hot": emo,
    }

    state, metrics = step(state, batch, jax.random.PRNGKey(5))  # compile
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for i in range(repeats):
        state, metrics = step(state, batch, jax.random.PRNGKey(6 + i))
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / repeats
    steps_per_s = 1.0 / dt

    # rough MFU from XLA's own flop count for the compiled step
    mfu = None
    try:
        jitted = getattr(step, "jitted", None)
        if jitted is not None:
            cost = (
                jitted.lower(state, batch, jax.random.PRNGKey(0), vq_params)
                .compile().cost_analysis()
            )
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            if flops > 0:
                mfu = flops * steps_per_s / PEAK_BF16_FLOPS_V5E * 100.0
    except Exception:
        pass

    out = [{
        "metric": f"mead_stage2_e2e_train_b{B}_t{T}_steps_per_s_v5e1",
        "value": round(steps_per_s, 4),
        "unit": "steps/s (higher is better)",
        "vs_baseline": round(steps_per_s / 1.0, 3),
    }]
    if mfu is not None:
        out.append({
            "metric": f"mead_stage2_e2e_train_b{B}_mfu_v5e1",
            "value": round(mfu, 2),
            "unit": "% of bf16 peak (xla-counted flops)",
            "vs_baseline": round(mfu / 10.0, 3),
        })
    return out


def main():
    from fdm_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="audio clip length the pipeline animates")
    ap.add_argument("--steps", type=int, default=1000,
                    help="MEAD DDPM denoise steps (reference: 1000)")
    ap.add_argument("--quick", action="store_true",
                    help="reduced steps/length MEAD-only smoke run")
    ap.add_argument("--only", default=None,
                    choices=["mead", "biwi", "vocaset", "train",
                             "throughput"],
                    help="run a single suite")
    ap.add_argument("--batch_size", type=int, default=8,
                    help="clips per batch for the throughput suite")
    ap.add_argument("--fused", action="store_true",
                    help="Pallas fused-attention denoiser")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (fp32 is the parity default)")
    ap.add_argument("--repeats", type=int, default=None,
                    help="timing repeats (default: 3; train suite 20/10)")
    args = ap.parse_args()

    explicit_repeats = args.repeats
    if args.quick:
        args.seconds, args.steps = 2.0, 50
        args.repeats = explicit_repeats or 1
    elif args.repeats is None:
        args.repeats = 3

    records = []
    suites = (
        [args.only] if args.only
        else (["mead"] if args.quick
              else ["biwi", "vocaset", "train", "throughput", "mead"])
    )
    for suite in suites:
        if suite == "throughput":
            records.append(bench_rtf(
                "mead", "ddpm", args.steps, args.seconds, args.repeats,
                args.fused, args.dtype, batch_size=args.batch_size,
            ))
        elif suite == "train":
            # an explicit --repeats wins; otherwise 20/10 steady-state steps
            records.extend(bench_train_step(
                repeats=explicit_repeats or 20, dtype=args.dtype,
            ))
            # batched training: utilization the reference's batch-1 loop
            # cannot reach
            records.extend(bench_train_step(
                repeats=explicit_repeats or 10, dtype=args.dtype,
                batch_size=8,
            ))
        elif suite == "mead":
            records.append(bench_rtf(
                "mead", "ddpm", args.steps, args.seconds, args.repeats,
                args.fused, args.dtype,
            ))
        elif suite == "biwi":
            records.append(bench_rtf(
                "biwi", "ddim", 50, args.seconds, args.repeats,
                args.fused, args.dtype,
            ))
        elif suite == "vocaset":
            records.append(bench_rtf(
                "vocaset", "ddim", 100, args.seconds, args.repeats,
                args.fused, args.dtype,
            ))

    for rec in records:
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
