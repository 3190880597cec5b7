"""Convert reference PyTorch checkpoints into fdm_tpu flax parameter pytrees.

Supports the reference's stage-1 VQ-VAE state dicts (saved as
`model-{epoch}.mpt` dicts with a 'model' key, or `model.pth.tar` with
'state_dict' — reference train/train_mead_vqvae.py:147-153 and
train/train_diffusion_vocaset.py:27) and the stage-2 FDM denoiser state
(including nn.TransformerDecoder packed in_proj layouts). Used for parity
evaluation against reference-trained weights; training from scratch does not
need torch at all, so the torch import is local.

Conventions:
  torch Linear weight (out, in)        -> flax Dense kernel (in, out) = W.T
  torch Conv1d weight (out, in, k)     -> flax Conv kernel (k, in, out)
  torch LayerNorm weight/bias          -> flax LayerNorm scale/bias
  torch MultiheadAttention in_proj (3E, E) packed [q; k; v] rows
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from fdm_tpu.configs import VQVAEConfig, FDMConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load any of the reference checkpoint container formats."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict):
        for key in ("model", "state_dict"):
            if key in blob and isinstance(blob[key], Mapping):
                blob = blob[key]
                break
    return {k: _np(v) for k, v in blob.items()}


def _dense(sd, name):
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _conv1d(sd, name):
    w = _np(sd[f"{name}.weight"])  # (out, in, k)
    out = {"kernel": w.transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _layernorm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _vq_transformer(sd, prefix: str, num_layers: int) -> Dict:
    """Reference models/lib/base_models.py Transformer ->
    fdm_tpu PreLNTransformer. Block 2j is Residual(Norm(Attention)), block
    2j+1 is Residual(Norm(MLP)); torch names run net.{i}.fn.{norm,fn}..."""
    tree = {}
    for j in range(num_layers):
        attn = f"{prefix}.net.{2 * j}.fn"
        mlp = f"{prefix}.net.{2 * j + 1}.fn"
        tree[f"attn_ln_{j}"] = _layernorm(sd, f"{attn}.norm")
        tree[f"attn_qkv_{j}"] = {"kernel": _np(sd[f"{attn}.fn.to_qkv.weight"]).T}
        tree[f"attn_out_{j}"] = _dense(sd, f"{attn}.fn.to_out")
        tree[f"mlp_ln_{j}"] = _layernorm(sd, f"{mlp}.norm")
        tree[f"mlp_fc1_{j}"] = _dense(sd, f"{mlp}.fn.l1")
        tree[f"mlp_fc2_{j}"] = _dense(sd, f"{mlp}.fn.l2")
    return tree


def convert_vqvae(sd: Dict[str, np.ndarray], cfg: VQVAEConfig) -> Dict:
    """Reference VQAutoEncoder state dict -> flax params for
    fdm_tpu.codec.VQAutoEncoder."""
    if cfg.quant_factor != 0:
        raise NotImplementedError(
            "reference presets all use quant_factor=0; transpose-conv import "
            "is not implemented"
        )
    enc = {
        "vertice_mapping": _dense(sd, "encoder.vertice_mapping.0"),
        "squasher": {"conv_0": _conv1d(sd, "encoder.squasher.0.0")},
        "pre_transformer": _dense(sd, "encoder.encoder_linear_embedding.net"),
        "transformer": _vq_transformer(
            sd, "encoder.encoder_transformer", cfg.num_hidden_layers
        ),
    }
    if "encoder.encoder_linear_embedding_post.net.weight" in sd:
        enc["post_transformer"] = _dense(
            sd, "encoder.encoder_linear_embedding_post.net"
        )
    if cfg.emotion_classes:
        enc["emotion_mapping"] = _dense(sd, "encoder.emotion_mapping.0")

    dec = {
        "expander": {"conv_0": _conv1d(sd, "decoder.expander.0.0")},
        "pre_transformer": _dense(sd, "decoder.decoder_linear_embedding.net"),
        "transformer": _vq_transformer(
            sd, "decoder.decoder_transformer", cfg.num_hidden_layers
        ),
        "vertice_map_reverse": _dense(sd, "decoder.vertice_map_reverse"),
    }
    if "decoder.decoder_linear_embedding_pre.net.weight" in sd:
        dec["pre_expander"] = _dense(sd, "decoder.decoder_linear_embedding_pre.net")
    # else: VOCASET variant feeds the frame-regrouped tokens straight into
    # the expander (reference vq_vae_vocaset.py) — matches post_pre_linear=False

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "codebook": _np(sd["quantize.embedding.weight"]),
        }
    }


def _torch_mha(sd, prefix: str):
    """torch nn.MultiheadAttention -> dict of q/k/v/out arrays (row-packed)."""
    in_proj_w = _np(sd[f"{prefix}.in_proj_weight"])  # (3E, E)
    in_proj_b = _np(sd[f"{prefix}.in_proj_bias"])    # (3E,)
    E = in_proj_w.shape[1]
    qw, kw, vw = in_proj_w[:E], in_proj_w[E : 2 * E], in_proj_w[2 * E :]
    qb, kb, vb = in_proj_b[:E], in_proj_b[E : 2 * E], in_proj_b[2 * E :]
    return {
        "q": {"kernel": qw.T, "bias": qb},
        "k": {"kernel": kw.T, "bias": kb},
        "v": {"kernel": vw.T, "bias": vb},
        "out": _dense(sd, f"{prefix}.out_proj"),
    }


def convert_fdm(sd: Dict[str, np.ndarray], cfg: FDMConfig) -> Dict:
    """Reference FDM state dict (minus the HF audio encoder, which converts
    separately via fdm_tpu.audio.convert) -> flax params for
    fdm_tpu.models.FDM."""
    tree = {
        "audio_extract_0": _dense(sd, "audio_extract.0"),
        "audio_extract_2": _dense(sd, "audio_extract.2"),
        "time_embed": _dense(sd, "time_embedd.0"),
        "latent_decoder": _dense(sd, "latent_decoder"),
    }
    # latent encoder: Sequential(Linear, Mish) for MEAD/VOCASET, bare Linear
    # for BIWI (reference models/fdm.py:38)
    if "latent_encoder.0.weight" in sd:
        tree["latent_encoder"] = _dense(sd, "latent_encoder.0")
    else:
        tree["latent_encoder"] = _dense(sd, "latent_encoder")
    if "style_embedd.weight" in sd:
        tree["style_embed"] = _dense(sd, "style_embedd")
    else:
        tree["style_embed"] = _dense(sd, "style_embedd.0")
    if cfg.emotion_classes:
        tree["emotion_embed"] = _dense(sd, "emotion_embedd")

    for layer in range(cfg.num_layers):
        p = f"transformer_decoder.layers.{layer}"
        tree[f"layer_{layer}"] = {
            "self_attn": _torch_mha(sd, f"{p}.self_attn"),
            "cross_attn": _torch_mha(sd, f"{p}.multihead_attn"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "norm3": _layernorm(sd, f"{p}.norm3"),
        }
    return {"params": tree}
