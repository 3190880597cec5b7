"""Codec-roundtrip probe for BOTH h2h sides (round-5 diagnosis, part 2).

The fdm_tpu h2h side hits its stage-1 codec's roundtrip ceiling on both
splits (sampled train delta +0.162 ~= codec roundtrip +0.158), so the
h2h end-to-end gap reduces to: how good is each side's 32-clip codec
after the same 3840 steps? This probe encodes->quantizes->decodes the
same clips through BOTH trained codecs and scores the same correlation
delta. (fdm_tpu side numbers already exist via sample-vqvae; recomputed
here with identical clip counts for a like-for-like table.)

CPU. Usage: PYTHONPATH=/root/repo python -u runs_r5/headtohead/codec_probe.py
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, "/root/repo")

import h2h_config as H  # noqa: E402

from fdm_tpu.data import synthetic_splits  # noqa: E402
from fdm_tpu.eval.correlation import correlation_report  # noqa: E402
from fdm_tpu.cli.common import FlameDecoder  # noqa: E402

N_TRAIN, N_TEST = 8, 4


def torch_roundtrip(records, template):
    import torch

    from ref_train import install_stubs, build_autoencoder

    install_stubs()
    ae = build_autoencoder()
    ae.load_state_dict(
        torch.load(os.path.join(H.REF_DIR, "stage1.pt"),
                   weights_only=False)["model"])
    ae.eval()
    preds = {}
    with torch.no_grad():
        for rec in records:
            z = np.load(os.path.join(H.DATA_DIR, rec.name + ".npz"))
            motion = torch.from_numpy(z["vertices"])[None]
            tpl = torch.from_numpy(template)[None]
            emo = torch.from_numpy(z["emotion"])[None]
            # the reference stage-2/sampling path: encode -> quant -> decode
            # (train/train_diffusion_mead.py:94-99)
            latent = ae.encode(motion - tpl, emo)
            quanted, _, _ = ae.quant(latent, emo)
            out = ae.decode(quanted) + tpl
            preds[rec.name] = out[0].numpy()
    return preds


def main():
    cfg = H.build_tpu_config()
    s = synthetic_splits(
        cfg, num_train=H.SIZE, num_eval=max(2, H.SIZE // 8),
        min_frames=40, max_frames=120, seed=H.SEED, with_audio=True,
        mode="correlated",
    )
    template = np.load(os.path.join(H.DATA_DIR, "template.npy"))
    flame = FlameDecoder(cfg, None, device=jax.devices("cpu")[0])

    def decode(params):
        T = params.shape[0]
        bucket = ((T + 63) // 64) * 64
        padded = np.zeros((bucket, params.shape[1]), np.float32)
        padded[:T] = params
        return np.asarray(flame(padded[None])[0][:T])

    out = {}
    for split_name, records in (("train", s.train[:N_TRAIN]),
                                ("test", s.test[:N_TEST])):
        preds = torch_roundtrip(records, template)
        rep = correlation_report(records, None, config=cfg, decode=decode,
                                 recompute_gt=True, preds=preds)
        out[f"reference_{split_name}"] = {
            "matched": rep["matched_corr_mean"],
            "mismatched": rep["mismatched_corr_mean"],
            "delta": rep["delta"],
        }
        print(split_name, out[f"reference_{split_name}"], flush=True)

    with open(os.path.join(HERE, "codec_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote codec_probe.json")


if __name__ == "__main__":
    main()
