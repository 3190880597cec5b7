"""Train/sample the ACTUAL reference framework (torch, /root/reference) on
the head-to-head dataset. This harness replicates the reference's own
training scripts faithfully (train/train_mead_vqvae.py:74-111 and
train/train_diffusion_mead.py:74-110, CPU instead of 'cuda:1'), importing
the reference's model classes unmodified; the ONLY surgery is:

  * stub modules for its broken/vestigial import surface (quirk Q1:
    video_diffusion_pytorch.text is missing from the repo; einops_exts /
    rotary_embedding_torch / torchvision are only used by the vestigial
    Unet3D/Trainer paths and are not installed here),
  * HubertModel.from_pretrained patched to build the SAME HuBERT-large
    layout from a local HubertConfig with num_hidden_layers=2 (no network,
    no checkpoint; matches fdm_tpu's fdm.audio_layers=2 side), and
  * pre-decoded FLAME vertices standing in for torch2mesh (the decode is
    data prep; both sides consume the same cached meshes).

Everything else — models, losses, optimizer, per-clip ragged batching,
sampler — is the reference's own code and regime.

Run (CPU): PYTHONPATH=/root/repo python runs_r5/headtohead/ref_train.py \
              --stage all
"""

import argparse
import os
import sys
import time
import types

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import h2h_config as H

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------- stubs
def install_stubs():
    """Pre-seed sys.modules so the reference's diffusion module imports.

    video_diffusion_pytorch.text does not exist in the repo (SURVEY quirk
    Q1) and the BERT text path is unused; einops_exts/rotary/torchvision
    feed only the vestigial Unet3D/gif-Trainer code (never instantiated by
    the FDM path)."""
    if "video_diffusion_pytorch.text" not in sys.modules:
        text = types.ModuleType("video_diffusion_pytorch.text")
        text.BERT_MODEL_DIM = 768

        def _unused(*a, **k):
            raise RuntimeError("reference BERT text path is unused")

        text.tokenize = text.bert_embed = _unused
        sys.modules["video_diffusion_pytorch.text"] = text

    if "einops_exts" not in sys.modules:
        import einops

        ee = types.ModuleType("einops_exts")
        ee.check_shape = lambda t, pattern, **kw: t
        ee.rearrange_many = lambda ts, pattern, **kw: tuple(
            einops.rearrange(t, pattern, **kw) for t in ts
        )
        sys.modules["einops_exts"] = ee

    if "rotary_embedding_torch" not in sys.modules:
        rot = types.ModuleType("rotary_embedding_torch")

        class RotaryEmbedding:  # vestigial Unet3D-only
            def __init__(self, *a, **k):
                raise RuntimeError("Unet3D path unused in the FDM pipeline")

        rot.RotaryEmbedding = RotaryEmbedding
        sys.modules["rotary_embedding_torch"] = rot

    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.utils = types.ModuleType("torchvision.utils")

        class _UnusedTransform:  # gif-Dataset path only, never exercised
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise RuntimeError("reference gif/transform path is unused")

        for name in ("ToTensor", "ToPILImage", "Resize",
                     "RandomHorizontalFlip", "CenterCrop", "Lambda",
                     "Compose"):
            setattr(tv.transforms, name, _UnusedTransform)
        # transformers probes importlib.util.find_spec("torchvision"),
        # which raises on spec-less stub modules
        for mod in (tv, tv.transforms, tv.utils):
            mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.utils"] = tv.utils

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def patch_hubert():
    """Replace the hardcoded '/data/WX/hubert-large-ls960-ft' load
    (reference models/fdm_vqvae_mead.py:17) with a local HubertConfig of
    the same layout truncated to H.AUDIO_LAYERS transformer layers —
    mirroring fdm_tpu's hubert_large_config() + fdm.audio_layers=2."""
    import models.hubert as ref_hubert
    from transformers import HubertConfig

    def _local(cls, *_a, **_k):
        cfg = HubertConfig(
            hidden_size=1024, num_hidden_layers=H.AUDIO_LAYERS,
            num_attention_heads=16, intermediate_size=4096,
            conv_bias=True, feat_extract_norm="layer",
            do_stable_layer_norm=True,
            # the reference wrapper's forward wires output_attentions
            # through (models/hubert.py:75-110); the installed
            # transformers' sdpa default forbids that combination
            attn_implementation="eager",
        )
        return cls(cfg)

    ref_hubert.HubertModel.from_pretrained = classmethod(_local)


# ---------------------------------------------------------------- data
def load_split(split):
    names = open(os.path.join(H.DATA_DIR, f"{split}.txt")).read().split()
    template = np.load(os.path.join(H.DATA_DIR, "template.npy"))  # (1, D)
    items = []
    for name in names:
        z = np.load(os.path.join(H.DATA_DIR, name + ".npz"))
        items.append(dict(
            name=name,
            motion=torch.from_numpy(z["vertices"])[None],     # (1, T, D)
            template=torch.from_numpy(template)[None],        # (1, 1, D)
            audio=torch.from_numpy(z["audio"])[None],         # (1, S)
            emotion=torch.from_numpy(z["emotion"])[None],     # (1, 7)
            style=torch.from_numpy(z["style"])[None],         # (1, 25)
        ))
    return items


# ---------------------------------------------------------------- stages
def ckpt_path(stage):
    return os.path.join(H.REF_DIR, f"stage{stage}.pt")


def save_ckpt(stage, epoch, model, opt):
    os.makedirs(H.REF_DIR, exist_ok=True)
    tmp = ckpt_path(stage) + ".tmp"
    torch.save({"epoch": epoch, "model": model.state_dict(),
                "opt": opt.state_dict()}, tmp)
    os.replace(tmp, ckpt_path(stage))


def maybe_resume(stage, model, opt):
    path = ckpt_path(stage)
    if os.path.exists(path):
        state = torch.load(path, weights_only=False)
        model.load_state_dict(state["model"])
        opt.load_state_dict(state["opt"])
        print(f"resumed stage{stage} from epoch {state['epoch']}")
        return state["epoch"]
    return 0


def build_autoencoder():
    from models.vq_vae_emotion import VQAutoEncoder

    ns = argparse.Namespace(neg=0.2, INaffine=False, **H.VQ)
    return VQAutoEncoder(ns)


def train_stage1(epochs):
    # reference train/train_mead_vqvae.py:35-111 (CPU, pre-decoded meshes)
    torch.manual_seed(H.SEED)
    autoencoder = build_autoencoder()
    optimizer = torch.optim.AdamW(autoencoder.parameters(), lr=1e-4,
                                  amsgrad=True)
    start = maybe_resume(1, autoencoder, optimizer)
    data = load_split("train")
    autoencoder.train()
    rng = np.random.RandomState(H.SEED)
    for epoch in range(1, epochs + 1):
        order = rng.permutation(len(data))
        if epoch <= start:
            continue  # keep the shuffle stream aligned across resumes
        t0, sum_loss = time.time(), 0.0
        for i in order:
            item = data[i]
            optimizer.zero_grad()
            recon, quant_loss, _ = autoencoder(
                item["motion"], item["template"], item["emotion"])
            rec = torch.nn.L1Loss()(recon, item["motion"])
            loss = quant_loss.mean() + rec
            loss.backward()
            optimizer.step()
            sum_loss += loss.item()
        print(f"stage1 epoch {epoch}/{epochs} loss={sum_loss/len(data):.5f}"
              f" ({time.time()-t0:.1f}s)", flush=True)
        if epoch % 20 == 0 or epoch == epochs:
            save_ckpt(1, epoch, autoencoder, optimizer)
    return autoencoder


def build_diffusion():
    patch_hubert()
    from models.fdm_vqvae_mead import FDM
    from video_diffusion_pytorch.diffusion_mead_encoder_decoder import (
        GaussianDiffusion,
    )

    model = FDM(feature_dim=H.FDM["feature_dim"], vertice_dim=H.VQ["in_dim"],
                n_head=H.FDM["n_head"], num_layers=H.FDM["num_layers"],
                struct="Dec")
    return GaussianDiffusion(model, timesteps=H.TIMESTEPS, loss_type="l2")


def freeze(model):
    # reference train/train_diffusion_mead.py:207-209
    for p in model.parameters():
        p.requires_grad = False


def train_stage2(epochs):
    # reference train/train_diffusion_mead.py:25-110 (CPU, pre-decoded)
    torch.manual_seed(H.SEED + 1)
    autoencoder = build_autoencoder()
    state = torch.load(ckpt_path(1), weights_only=False)
    autoencoder.load_state_dict(state["model"])
    freeze(autoencoder)
    autoencoder.eval()

    diffusion = build_diffusion()
    optimizer = torch.optim.AdamW(diffusion.parameters(), lr=1e-4)
    start = maybe_resume(2, diffusion, optimizer)
    data = load_split("train")
    diffusion.train()
    rng = np.random.RandomState(H.SEED + 1)
    for epoch in range(1, epochs + 1):
        order = rng.permutation(len(data))
        if epoch <= start:
            continue
        t0, sum_loss = time.time(), 0.0
        for i in order:
            item = data[i]
            optimizer.zero_grad()
            motion, template = item["motion"], item["template"]
            latent = autoencoder.encode(motion - template, item["emotion"])
            denoise_loss, result = diffusion(
                latent, item["audio"], item["emotion"], item["style"])
            quanted, _, _ = autoencoder.quant(result, item["emotion"])
            output = autoencoder.decode(quanted) + template
            loss_recon = torch.nn.functional.l1_loss(output, motion)
            loss = denoise_loss + loss_recon
            loss.backward()
            optimizer.step()
            sum_loss += loss.item()
        print(f"stage2 epoch {epoch}/{epochs} loss={sum_loss/len(data):.5f}"
              f" ({time.time()-t0:.1f}s)", flush=True)
        if epoch % 10 == 0 or epoch == epochs:
            save_ckpt(2, epoch, diffusion, optimizer)
    return diffusion


def sample():
    # reference samples/sample_diffusion_mead.py:60-86 (1000-step DDPM)
    torch.manual_seed(H.SEED + 2)
    autoencoder = build_autoencoder()
    autoencoder.load_state_dict(
        torch.load(ckpt_path(1), weights_only=False)["model"])
    autoencoder.eval()
    diffusion = build_diffusion()
    diffusion.load_state_dict(
        torch.load(ckpt_path(2), weights_only=False)["model"])
    diffusion.eval()

    out_dir = os.path.join(H.REF_DIR, "preds")
    os.makedirs(out_dir, exist_ok=True)
    with torch.no_grad():
        for item in load_split("test"):
            t0 = time.time()
            hidden = diffusion.denoise_fn.audio_encoder(
                item["audio"]).last_hidden_state
            length = hidden.shape[1] // 2
            result = diffusion.sample(
                item["audio"], (1, length * 8, H.VQ["zquant_dim"]),
                item["emotion"], item["style"])
            quanted, _, _ = autoencoder.quant(result, item["emotion"])
            output = autoencoder.decode(quanted) + item["template"]
            np.save(os.path.join(out_dir, item["name"] + ".npy"),
                    output[0].numpy())
            print(f"sampled {item['name']} T={output.shape[1]} "
                  f"({time.time()-t0:.1f}s)", flush=True)
    print("wrote", out_dir)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", default="all",
                        choices=["s1", "s2", "sample", "all"])
    parser.add_argument("--s1_epochs", type=int, default=H.STAGE1_EPOCHS)
    parser.add_argument("--s2_epochs", type=int, default=H.STAGE2_EPOCHS)
    args = parser.parse_args()
    torch.set_num_threads(1)

    install_stubs()
    if args.stage in ("s1", "all"):
        train_stage1(args.s1_epochs)
    if args.stage in ("s2", "all"):
        train_stage2(args.s2_epochs)
    if args.stage in ("sample", "all"):
        sample()


if __name__ == "__main__":
    main()
