"""Stage-2 train-step roofline decomposition (VERDICT r3 weak #4 / item 6).

Why does the stage-2 e2e step plateau at ~28% fp32 / ~40% bf16 MFU while
stage-1 reaches 68%? This script attributes the step across its three
components by compiling + timing each in isolation at the bench shape
(b8, T=120, 5 s clips, MEAD):

  hubert  : encode_audio fwd + bwd wrt encoder params (conv frozen)
  fdm     : FDM denoise-loss fwd + bwd with PRECOMPUTED audio hidden
            (includes the frozen codec encode inside stage2_train_loss)
  full    : the production make_stage2_e2e_step

For each program it reports wall time (device_get-synced, best of two
blocks), XLA-counted flops, flops/s, % of bf16 peak, and bytes accessed
(HBM traffic estimate) — enough to say whether each component is MXU-,
HBM-, or latency-bound, and where the composite step's ceiling comes
from. Writes JSON next to this script and prints a markdown table for
docs/PERF.md.

Run on an otherwise-idle chip: PYTHONPATH=/root/repo:/root/.axon_site
python -u runs_r4/stage2_roofline.py [--dtype bfloat16] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

PEAK_BF16 = 197e12


def measure(name, fn, args, repeats):
    import jax

    out = fn(*args)  # compile + warmup
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        dt = min(dt, (time.perf_counter() - t0) / repeats)
    cost = fn.lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    nbytes = float(cost.get("bytes accessed", 0.0))
    return {
        "name": name,
        "ms": dt * 1e3,
        "gflops": flops / 1e9,
        "tflops_per_s": flops / dt / 1e12,
        "mfu_pct": flops / dt / PEAK_BF16 * 100.0,
        "gbytes": nbytes / 1e9,
        "gbytes_per_s": nbytes / dt / 1e9,
        "arith_intensity": flops / max(nbytes, 1.0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fdm_tpu.cli.common import enable_compilation_cache
    from fdm_tpu.configs import get_config
    from fdm_tpu.models import LatentDiffusion
    from fdm_tpu.train import (
        create_train_state, default_optimizer, frozen_aware_optimizer,
        make_stage2_e2e_step,
    )

    enable_compilation_cache()
    cfg = get_config("mead")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    ld = LatentDiffusion.create(cfg, dtype=dtype, with_audio_encoder=True)
    B = args.batch
    T = int(args.seconds * cfg.dataset.fps)
    sr = cfg.dataset.audio_sr
    rng = np.random.default_rng(0)
    motion = (rng.standard_normal((B, T, cfg.vqvae.in_dim)) * 0.01
              ).astype(np.float32)
    template = np.zeros((B, 1, cfg.vqvae.in_dim), np.float32)
    wav = (rng.standard_normal((B, int(args.seconds * sr) + sr)) * 0.1
           ).astype(np.float32)
    style = np.eye(cfg.fdm.style_classes, dtype=np.float32)[
        np.arange(B) % cfg.fdm.style_classes]
    emo = np.eye(cfg.fdm.emotion_classes, dtype=np.float32)[
        np.arange(B) % cfg.fdm.emotion_classes]

    vq_params = jax.jit(ld.vqvae.init)(
        jax.random.PRNGKey(2), motion[:, :8], template, emo)
    enc_params = jax.jit(ld.audio_encoder.init)(
        jax.random.PRNGKey(3), np.zeros((B, 6400), np.float32))
    hidden = jax.jit(lambda p, w: ld.encode_audio(p, w, T))(enc_params, wav)
    L = T * cfg.fdm.tokens_per_frame
    fdm_params = jax.jit(ld.fdm.init)(
        jax.random.PRNGKey(4),
        np.zeros((B, L, cfg.vqvae.zquant_dim), np.float32),
        np.zeros((B,), np.int32), hidden, style, emo)

    wav_d, motion_d, template_d, style_d, emo_d, hidden_d = map(
        jax.device_put, (wav, motion, template, style, emo, hidden))
    key = jax.random.PRNGKey(7)
    rows = []

    # ---- hubert: encoder fwd+bwd wrt its params (conv frozen, like the
    # production loss), reduced by a mean so there is a scalar to pull ----
    @jax.jit
    def hubert_step(enc_params, wav):
        def loss(p):
            h = ld.encode_audio(p, wav, T, specaugment_key=key,
                                freeze_extractor=True)
            return jnp.mean(jnp.square(h))
        return jax.value_and_grad(loss)(enc_params)

    rows.append(measure("hubert_fwd_bwd", hubert_step,
                        (enc_params, wav_d), args.repeats))

    # ---- hubert fwd only (the inference-side cost inside sampling) ----
    @jax.jit
    def hubert_fwd(enc_params, wav):
        return ld.encode_audio(enc_params, wav, T)

    rows.append(measure("hubert_fwd", hubert_fwd,
                        (enc_params, wav_d), args.repeats))

    # ---- fdm(+frozen codec encode): stage-2 loss with precomputed
    # hidden states, grads wrt FDM params only ----
    @jax.jit
    def fdm_step(fdm_params, vq_params, motion, template, hidden,
                 style, emo):
        def loss(p):
            return ld.stage2_train_loss(
                vq_params, p, key, motion, template, hidden, style, emo,
            )[0]
        return jax.value_and_grad(loss)(fdm_params)

    rows.append(measure(
        "fdm_codec_fwd_bwd", fdm_step,
        (fdm_params, vq_params, motion_d, template_d, hidden_d,
         style_d, emo_d),
        args.repeats))

    # ---- the full production step ----
    params = {"fdm": fdm_params, "audio": enc_params}
    tx = frozen_aware_optimizer(default_optimizer(), params)
    state = create_train_state(params, tx)
    step = make_stage2_e2e_step(ld, tx, vq_params)
    batch = jax.device_put({
        "motion": motion, "template": template, "audio": wav,
        "style_one_hot": style, "emotion_one_hot": emo,
    })

    def full(state):
        s, metrics = step(state, batch, key)
        return metrics["loss"]

    out = full(state)
    jax.device_get(out.ravel()[0])
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = full(state)
        jax.device_get(out.ravel()[0])
        dt = min(dt, (time.perf_counter() - t0) / args.repeats)
    cost = step.jitted.lower(state, batch, key, vq_params).compile(
    ).cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    nbytes = float(cost.get("bytes accessed", 0.0))
    rows.append({
        "name": "full_e2e_step", "ms": dt * 1e3, "gflops": flops / 1e9,
        "tflops_per_s": flops / dt / 1e12,
        "mfu_pct": flops / dt / PEAK_BF16 * 100.0,
        "gbytes": nbytes / 1e9, "gbytes_per_s": nbytes / dt / 1e9,
        "arith_intensity": flops / max(nbytes, 1.0),
    })

    report = {"dtype": args.dtype, "batch": B, "T": T, "rows": rows}
    out_path = args.json_out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"stage2_roofline_{args.dtype}_b{B}.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)

    print(f"\nstage-2 roofline — {args.dtype} b{B} T={T}\n")
    print("| component | ms | GFLOP | TFLOP/s | MFU% | GB | GB/s | FLOP/B |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['name']} | {r['ms']:.1f} | {r['gflops']:.0f} "
              f"| {r['tflops_per_s']:.1f} | {r['mfu_pct']:.1f} "
              f"| {r['gbytes']:.2f} | {r['gbytes_per_s']:.0f} "
              f"| {r['arith_intensity']:.0f} |")
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
