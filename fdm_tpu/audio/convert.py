"""Convert HF transformers wav2vec2/HuBERT torch weights to fdm_tpu flax
params (fdm_tpu.audio.AudioEncoder tree).

The positional conv's weight-norm (weight_g / weight_v) is materialized into
a plain kernel at conversion time — numerically identical in eval, and
training continues on the merged kernel.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from fdm_tpu.audio.encoder import AudioEncoderConfig


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_hf_audio_encoder(
    state_dict: Dict, cfg: AudioEncoderConfig
) -> Dict:
    """HF Wav2Vec2Model / HubertModel state_dict -> flax params tree."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def dense(name):
        out = {"kernel": sd[f"{name}.weight"].T}
        if f"{name}.bias" in sd:
            out["bias"] = sd[f"{name}.bias"]
        return out

    def ln(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    def conv(name):
        w = sd[f"{name}.weight"]  # (out, in/groups, k)
        out = {"kernel": w.transpose(2, 1, 0)}
        if f"{name}.bias" in sd:
            out["bias"] = sd[f"{name}.bias"]
        return out

    fx: Dict = {}
    for i in range(len(cfg.conv_dim)):
        fx[f"conv_{i}"] = conv(f"feature_extractor.conv_layers.{i}.conv")
        if cfg.feat_extract_norm == "layer":
            fx[f"conv_ln_{i}"] = ln(
                f"feature_extractor.conv_layers.{i}.layer_norm"
            )
    if cfg.feat_extract_norm == "group":
        g = f"feature_extractor.conv_layers.0.layer_norm"
        fx["group_norm"] = {"scale": sd[f"{g}.weight"], "bias": sd[f"{g}.bias"]}

    # feature projection (wav2vec2 and hubert share the layout)
    fp_ln = ln("feature_projection.layer_norm")
    fp_proj = dense("feature_projection.projection")

    # positional conv: merge weight norm g * v / ||v||
    # HF >=4.30 may store parametrizations; support both layouts
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in sd:
        g_, v_ = sd[f"{base}.weight_g"], sd[f"{base}.weight_v"]
    elif f"{base}.parametrizations.weight.original0" in sd:
        g_ = sd[f"{base}.parametrizations.weight.original0"]
        v_ = sd[f"{base}.parametrizations.weight.original1"]
    else:
        g_, v_ = None, sd[f"{base}.weight"]
    if g_ is not None:
        # torch _weight_norm(v, g, dim=2): norm over all dims except dim 2
        norm = np.sqrt(
            np.sum(v_**2, axis=(0, 1), keepdims=True)
        )
        w = g_ * v_ / norm
    else:
        w = v_
    pos_conv = {
        "conv": {
            "kernel": w.transpose(2, 1, 0),
            "bias": sd[f"{base}.bias"],
        }
    }

    layers: Dict = {}
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        layers[f"layer_{i}"] = {
            "q": dense(f"{p}.attention.q_proj"),
            "k": dense(f"{p}.attention.k_proj"),
            "v": dense(f"{p}.attention.v_proj"),
            "out": dense(f"{p}.attention.out_proj"),
            "attn_ln": ln(f"{p}.layer_norm"),
            "fc1": dense(f"{p}.feed_forward.intermediate_dense"),
            "fc2": dense(f"{p}.feed_forward.output_dense"),
            "final_ln": ln(f"{p}.final_layer_norm"),
        }

    tree = {
        "feature_extractor": fx,
        "fp_ln": fp_ln,
        "fp_proj": fp_proj,
        "pos_conv": pos_conv,
        "enc_ln": ln("encoder.layer_norm"),
        **layers,
    }
    if cfg.apply_spec_augment and cfg.mask_time_prob > 0:
        if "masked_spec_embed" in sd:
            tree["masked_spec_embed"] = sd["masked_spec_embed"]
        else:
            # older exports may lack it; match HF's uniform_[0,1) init
            tree["masked_spec_embed"] = np.random.default_rng(0).uniform(
                size=(cfg.hidden_size,)
            ).astype(np.float32)
    return {"params": tree}
