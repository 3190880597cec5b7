"""Weight conversion CLI: reference PyTorch / HF checkpoints -> fdm_tpu
.msgpack parameter artifacts.

Covers the three pretrained families the reference consumes (SURVEY.md §7.3
"weight conversion"):
  * stage-1 VQ-VAE   — model-{epoch}.mpt ('model') or model.pth.tar
                       ('state_dict')                    (--kind vqvae)
  * stage-2 FDM      — same containers; the embedded HF audio encoder
                       converts separately                (--kind fdm)
  * audio encoder    — HF wav2vec2/HuBERT checkpoint dir or state dict
                       (--kind audio)

  python -m fdm_tpu convert-weights --kind vqvae --dataset mead \
      --checkpoint model-400.mpt --output mead_vqvae_params.msgpack
"""

from __future__ import annotations

import argparse

from fdm_tpu.cli.common import add_common_args, build_config


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--kind", required=True,
                        choices=["vqvae", "fdm", "audio"])
    parser.add_argument("--checkpoint", required=True,
                        help="torch .mpt/.pth.tar/.bin file or HF model dir")
    parser.add_argument("--encoder", default=None,
                        help="audio: hubert-large | wav2vec2-base "
                             "(default: the dataset's encoder)")
    parser.add_argument("--output", required=True, help="output .msgpack")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from fdm_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from fdm_tpu.utils.serialization import save_params
    from fdm_tpu.utils.torch_import import load_torch_state_dict

    cfg = build_config(args)
    if args.kind == "vqvae":
        from fdm_tpu.utils.torch_import import convert_vqvae

        params = convert_vqvae(load_torch_state_dict(args.checkpoint), cfg.vqvae)
    elif args.kind == "fdm":
        from fdm_tpu.utils.torch_import import convert_fdm

        sd = load_torch_state_dict(args.checkpoint)
        # the reference stores the FDM inside the GaussianDiffusion wrapper
        # as denoise_fn.*; strip an outer DataParallel 'module.' FIRST so
        # module.denoise_fn.* sheds both prefixes
        for prefix in ("module.", "denoise_fn."):
            if any(k.startswith(prefix) for k in sd):
                sd = {
                    k[len(prefix):]: v
                    for k, v in sd.items() if k.startswith(prefix)
                }
        params = convert_fdm(sd, cfg.fdm)
    else:
        import os

        from fdm_tpu.audio.convert import convert_hf_audio_encoder
        from fdm_tpu.audio.encoder import encoder_config_for, get_encoder_config

        enc_cfg = (
            get_encoder_config(args.encoder)
            if args.encoder else encoder_config_for(cfg.fdm)
        )
        if os.path.isdir(args.checkpoint):
            import torch

            for name in ("pytorch_model.bin", "model.safetensors"):
                path = os.path.join(args.checkpoint, name)
                if os.path.exists(path):
                    break
            else:
                raise SystemExit(f"no weights file found in {args.checkpoint}")
            if path.endswith(".safetensors"):
                from safetensors.torch import load_file

                sd = load_file(path)
            else:
                sd = torch.load(path, map_location="cpu", weights_only=True)
        else:
            sd = load_torch_state_dict(args.checkpoint)
        params = convert_hf_audio_encoder(sd, enc_cfg)

    save_params(args.output, params)
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {args.kind} checkpoint ({n:,} params) -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
