"""Primitive elementwise / normalization ops shared across the framework."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.nn


def hw_dropout_key(key: "jax.Array") -> "jax.Array":
    """Rewrap a PRNG key onto the 'rbg' implementation (XLA RngBitGenerator).

    Training-time regularization draws on the order of 1e9 dropout bits per
    stage-2 step at batch 16 — a (B, H, N, N) attention-probs mask per
    audio-encoder layer x 24 layers plus the FFN-activation masks, all
    redrawn under remat in the backward pass. With the default threefry2x32
    generator this measured 65 ms of a 204 ms b16-bf16 train step on v5e
    (attention-probs 46 ms, activation 15 ms, LayerDrop 4 ms); rewrapping
    the dropout keys onto the hardware rng-bit-generator recovered 54 ms.
    Only the random BITS differ — the dropout math (probabilities, inverted
    scaling, determinism contract) is unchanged, and eval paths never draw.
    Accepts typed keys and raw uint32 (2,) keys.
    """
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = jnp.asarray(key, jnp.uint32)
    data = jnp.concatenate([data, data], axis=-1)[..., :4]
    return jax.random.wrap_key_data(data, impl="rbg")


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation: x * tanh(softplus(x)) (torch nn.Mish equivalent)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def masked_mean(err: jnp.ndarray, mask) -> jnp.ndarray:
    """Padding-aware mean of a (B, T, C) error tensor.

    mask is an optional (B, T) weight (1 = real frame, 0 = padding); the
    normalizer counts only real elements (sum(mask) * C, floored at 1 for
    fully-masked batches), so bucketed static-shape padding never dilutes
    the objective. The ONE definition used by the stage-1 recon loss, the
    stage-2 recon loss, and the diffusion p_losses — keep them identical or
    the losses silently diverge under padding."""
    if mask is None:
        return jnp.mean(err)
    w = mask[..., None].astype(err.dtype)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w) * err.shape[-1], 1.0)


def instance_norm_1d(
    x: jnp.ndarray, eps: float = 1e-5, axis: int = 1
) -> jnp.ndarray:
    """InstanceNorm over the time axis of a (B, L, C) sequence, per channel.

    Equivalent to torch nn.InstanceNorm1d (affine=False,
    track_running_stats=False) applied to the (B, C, L) layout the reference
    uses in its VQ-VAE conv stacks (reference models/vq_vae.py:146). We keep
    the TPU-friendly (B, L, C) layout and normalize over L.
    """
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def fill_padding_with_edge(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Replace tail padding of (B, L, C) with each sequence's last VALID
    frame. Convolutions then see exactly the edge-replicated signal they
    would see on the unpadded sequence, so bucketed static-shape batches
    compute identical features for valid frames (padding always sits at the
    tail in this framework's collate)."""
    lengths = jnp.sum(mask > 0, axis=1).astype(jnp.int32)        # (B,)
    idx = jnp.minimum(
        jnp.arange(x.shape[1])[None, :], jnp.maximum(lengths - 1, 0)[:, None]
    )                                                            # (B, L)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def replicate_pad_1d(x: jnp.ndarray, pad: int, axis: int = 1) -> jnp.ndarray:
    """Edge-replicate padding along the time axis (torch padding_mode='replicate')."""
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (pad, pad)
    return jnp.pad(x, pad_width, mode="edge")
