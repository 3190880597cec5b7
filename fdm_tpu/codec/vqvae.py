"""(E)VQ-VAE motion codec — stage 1 of the pipeline, in flax.linen.

One parameterized implementation covering the reference's three model files
(models/vq_vae.py [BIWI], vq_vae_emotion.py [MEAD], vq_vae_vocaset.py
[VOCASET]) via VQVAEConfig:

  encoder: Linear+LeakyReLU vertex mapping (+ optional emotion mapping) ->
           Conv1d "squasher" (stride-2 chain when quant_factor>0, else one
           stride-1 k5 replicate-pad conv) -> pre-LN transformer ->
           Linear to face_quan_num*zquant_dim token channels
  quant:   nearest-neighbor codebook (optionally emotion-partitioned)
  decoder: Linear from token channels -> Conv "expander" -> transformer ->
           final Linear to vertex space

Reference quirks reproduced deliberately (see SURVEY.md §2.6):
  * attention scale is hidden_size**-0.5, NOT head_dim**-0.5
    (reference models/lib/base_models.py:144);
  * the "positional encoding" adds a constant batch-row vector, carrying no
    positional information (base_models.py:296-301) — pos_mode='reference';
  * VOCASET's decoder output Linear has a bias, MEAD/BIWI's doesn't.

Layout is (B, L, C) throughout (no BCL permutes — XLA prefers feature-minor).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fdm_tpu.configs import VQVAEConfig
from fdm_tpu.codec import quantizer as quant_lib
from fdm_tpu.ops.basic import (
    fill_padding_with_edge,
    instance_norm_1d,
    replicate_pad_1d,
)
from fdm_tpu.ops.positional import sinusoidal_table


def frames_to_tokens(h: jnp.ndarray, tokens_per_frame: int) -> jnp.ndarray:
    """(B, T, tokens*D) frame-major -> (B, T*tokens, D) token-major."""
    B, T, C = h.shape
    return h.reshape(B, T * tokens_per_frame, C // tokens_per_frame)


def tokens_to_frames(z: jnp.ndarray, tokens_per_frame: int) -> jnp.ndarray:
    """(B, T*tokens, D) token-major -> (B, T, tokens*D) frame-major."""
    B, L, D = z.shape
    return z.reshape(B, L // tokens_per_frame, tokens_per_frame * D)


def _pool_pair_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Mask update for one stride-2 max-pool stage: floor(L/2) windows, a
    window valid only when BOTH input frames are (the unpadded computation
    drops an odd tail frame entirely, so a straddling half-valid window
    must be masked out). The ONE definition shared by the encoder's pooling
    (ConvSquasher) and the standalone mask downsampler — these must stay in
    lock-step or masked batches diverge from per-clip computation."""
    L = (mask.shape[1] // 2) * 2
    return mask[:, :L:2] * mask[:, 1:L:2]


def downsample_frame_mask(mask: jnp.ndarray, quant_factor: int) -> jnp.ndarray:
    """Full-frame-rate mask (B, T) -> latent-rate mask matching the
    ConvSquasher's length arithmetic: the first stride-2 conv keeps
    ceil(T/2) frames (a frame is valid iff its window START is valid), each
    further max-pool stage keeps floor(L/2) frames — a pooled window is
    valid only when BOTH inputs are (the unpadded computation has no
    straddling window: an odd tail frame is dropped by floor, so a
    half-valid window must be masked out or every downstream token
    diverges from the per-clip computation). Identity for
    quant_factor == 0 (every shipped preset)."""
    for i in range(quant_factor):
        if i == 0:
            mask = mask[:, ::2]
        else:
            mask = _pool_pair_mask(mask)
    return mask


class PreLNTransformer(nn.Module):
    """The reference's stage-1 transformer backbone: alternating
    Residual(LN -> Attention) and Residual(LN -> MLP) blocks with exact GELU
    (reference models/lib/base_models.py:177-227)."""

    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 key_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """key_mask (B, L): 1 = real position. Bucketed static-shape batches
        pad the tail; the transformer is BIDIRECTIONAL, so without this mask
        pad frames would leak into valid frames' features (the reference
        never pads — batch size 1, exact lengths)."""
        dim = self.hidden_size
        # reference quirk: softmax scale uses the FULL model dim
        scale = dim**-0.5
        key_bias = None
        if key_mask is not None:
            key_bias = jnp.where(
                key_mask[:, None, None, :] > 0, 0.0, -jnp.inf
            ).astype(jnp.float32)
        for layer in range(self.num_layers):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"attn_ln_{layer}")(x)
            qkv = nn.Dense(
                3 * dim, use_bias=False, dtype=self.dtype, name=f"attn_qkv_{layer}"
            )(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            B, L, _ = q.shape
            hd = dim // self.num_heads
            q = q.reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
            if key_bias is not None:
                logits = logits + key_bias
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
                self.dtype
            )
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(B, L, dim)
            out = nn.Dense(dim, dtype=self.dtype, name=f"attn_out_{layer}")(out)
            x = x + out

            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"mlp_ln_{layer}")(x)
            h = nn.Dense(
                self.intermediate_size, dtype=self.dtype, name=f"mlp_fc1_{layer}"
            )(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(dim, dtype=self.dtype, name=f"mlp_fc2_{layer}")(h)
            x = x + h
        return x


class _InstanceNorm(nn.Module):
    """InstanceNorm over time, optionally affine per channel (the reference's
    INaffine flag, torch InstanceNorm1d(affine=...) — reference
    models/vq_vae.py:146; every reference preset leaves it False)."""

    affine: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """mask (B, L): statistics over valid positions only — InstanceNorm
        reduces over TIME, so unmasked padding would shift every frame's
        normalization (the second pad-leak path besides attention)."""
        if mask is None:
            x = instance_norm_1d(x)
        else:
            w = mask[..., None].astype(x.dtype)
            n = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
            mean = jnp.sum(x * w, axis=1, keepdims=True) / n
            var = jnp.sum(jnp.square(x - mean) * w, axis=1, keepdims=True) / n
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.affine:
            C = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (C,))
            bias = self.param("bias", nn.initializers.zeros, (C,))
            x = x * scale + bias
        return x


class ConvSquasher(nn.Module):
    """Temporal conv stack before/after the transformer (k5, replicate pad,
    LeakyReLU, InstanceNorm) — reference vq_vae.py:141-164."""

    hidden_size: int
    quant_factor: int
    neg_slope: float
    dtype: jnp.dtype = jnp.float32
    in_affine: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        """Returns (x, mask) — the mask downsampled to x's frame rate so
        downstream stages (transformer, quantizer) mask at the right rate."""
        if self.quant_factor == 0:
            x = replicate_pad_1d(x, 2)
            x = nn.Conv(
                self.hidden_size, (5,), padding="VALID", dtype=self.dtype,
                name="conv_0",
            )(x)
            x = nn.leaky_relu(x, self.neg_slope)
            x = _InstanceNorm(self.in_affine, name="norm_0")(x, mask)
            return x, mask
        x = replicate_pad_1d(x, 2)
        x = nn.Conv(
            self.hidden_size, (5,), strides=(2,), padding="VALID",
            dtype=self.dtype, name="conv_0",
        )(x)
        x = nn.leaky_relu(x, self.neg_slope)
        mask = mask[:, ::2] if mask is not None else None  # ceil(L/2)
        x = _InstanceNorm(self.in_affine, name="norm_0")(x, mask)
        for i in range(1, self.quant_factor):
            if mask is not None:
                # the previous stage leaves garbage in the padding region;
                # re-edge-fill so this k5 conv's valid tail outputs see
                # exactly the frames the unpadded computation's replicate
                # padding would give (padding is contiguous at the tail)
                x = fill_padding_with_edge(x, mask)
            x = replicate_pad_1d(x, 2)
            x = nn.Conv(
                self.hidden_size, (5,), padding="VALID", dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, self.neg_slope)
            x = _InstanceNorm(self.in_affine, name=f"norm_{i}")(x, mask)
            x = nn.max_pool(x, (2,), strides=(2,))
            if mask is not None:
                mask = _pool_pair_mask(mask)
        return x, mask


class ConvExpander(nn.Module):
    """Decoder-side temporal expansion — reference vq_vae.py:283-312."""

    hidden_size: int
    quant_factor: int
    neg_slope: float
    dtype: jnp.dtype = jnp.float32
    in_affine: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        """Takes x and its mask at the LATENT rate; returns (x, mask) with
        both upsampled back toward the frame rate."""
        if self.quant_factor == 0:
            x = replicate_pad_1d(x, 2)
            x = nn.Conv(
                self.hidden_size, (5,), padding="VALID", dtype=self.dtype,
                name="conv_0",
            )(x)
            x = nn.leaky_relu(x, self.neg_slope)
            x = _InstanceNorm(self.in_affine, name="norm_0")(x, mask)
            return x, mask
        x = nn.ConvTranspose(
            self.hidden_size, (5,), strides=(2,), padding="SAME",
            dtype=self.dtype, name="deconv_0",
        )(x)
        x = nn.leaky_relu(x, self.neg_slope)
        mask = jnp.repeat(mask, 2, axis=1) if mask is not None else None
        x = _InstanceNorm(self.in_affine, name="norm_0")(x, mask)
        for i in range(1, self.quant_factor):
            if mask is not None:
                # same tail-exactness argument as the squasher: the deconv /
                # previous stage left garbage in the padding region; valid
                # outputs of this k5 conv read up to 2 frames past the valid
                # end, which edge-fill makes identical to the unpadded
                # computation's replicate padding
                x = fill_padding_with_edge(x, mask)
            x = replicate_pad_1d(x, 2)
            x = nn.Conv(
                self.hidden_size, (5,), padding="VALID", dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, self.neg_slope)
            x = _InstanceNorm(self.in_affine, name=f"norm_{i}")(x, mask)
            x = jnp.repeat(x, 2, axis=1)
            mask = jnp.repeat(mask, 2, axis=1) if mask is not None else None
        return x, mask


class VQEncoder(nn.Module):
    config: VQVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, motion: jnp.ndarray, one_hot: Optional[jnp.ndarray] = None,
        frame_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        if frame_mask is not None:
            # make tail padding an exact edge-replication of the last valid
            # frame so the conv stack matches the unpadded computation
            motion = fill_padding_with_edge(motion, frame_mask)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="vertice_mapping")(
            motion
        )
        x = nn.leaky_relu(x, cfg.neg_slope)
        if cfg.emotion_classes:
            if one_hot is None:
                raise ValueError("emotion-conditioned encoder requires one_hot")
            e = nn.Dense(
                cfg.hidden_size, dtype=self.dtype, name="emotion_mapping"
            )(one_hot.astype(self.dtype))
            e = nn.leaky_relu(e, cfg.neg_slope)
            # (B, classes) -> broadcast over time like the reference's
            # (B, 1, C) + (B, L, C) add (vq_vae_emotion.py:189-190)
            x = x + e[:, None, :]
        x, latent_mask = ConvSquasher(
            cfg.hidden_size, cfg.quant_factor, cfg.neg_slope, self.dtype,
            cfg.in_affine, name="squasher",
        )(x, frame_mask)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pre_transformer")(x)
        x = x + jnp.asarray(
            sinusoidal_table(1, cfg.hidden_size)[0], dtype=self.dtype
        )  # reference batch-constant "PE" (pos_mode='reference')
        x = PreLNTransformer(
            cfg.hidden_size, cfg.num_hidden_layers, cfg.num_attention_heads,
            cfg.intermediate_size, self.dtype, name="transformer",
        )(x, latent_mask)
        if cfg.post_pre_linear:
            x = nn.Dense(
                cfg.latent_frame_dim, dtype=self.dtype, name="post_transformer"
            )(x)
        elif cfg.hidden_size != cfg.latent_frame_dim:
            raise ValueError(
                "post_pre_linear=False requires hidden_size == "
                "face_quan_num * zquant_dim"
            )
        return frames_to_tokens(x, cfg.face_quan_num)


class VQDecoder(nn.Module):
    config: VQVAEConfig
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_q_tokens: jnp.ndarray,
                 frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        x = tokens_to_frames(z_q_tokens, cfg.face_quan_num)
        # the decoder input is at the LATENT frame rate; callers pass the
        # full-frame-rate mask, downsample it to match
        latent_mask = (
            downsample_frame_mask(frame_mask, cfg.quant_factor)
            if frame_mask is not None else None
        )
        if latent_mask is not None:
            if cfg.quant_factor == 0:
                # the k5 conv uses replicate padding at the sequence end, so
                # edge-filling the batch padding reproduces the unpadded
                # computation exactly
                x = fill_padding_with_edge(x, latent_mask)
            else:
                # the stride-2 ConvTranspose zero-pads implicitly beyond the
                # input; zero-filling the batch padding matches it exactly
                # (the quant_factor>=2 replicate-pad conv stages re-edge-fill
                # inside ConvExpander, so every depth is exact on the valid
                # prefix — pinned by tests/test_vqvae.py)
                x = x * latent_mask[..., None].astype(x.dtype)
        if cfg.post_pre_linear:
            x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pre_expander")(x)
        x, up_mask = ConvExpander(
            cfg.hidden_size, cfg.quant_factor, cfg.neg_slope, self.dtype,
            cfg.in_affine, name="expander",
        )(x, latent_mask)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pre_transformer")(x)
        x = x + jnp.asarray(
            sinusoidal_table(1, cfg.hidden_size)[0], dtype=self.dtype
        )
        x = PreLNTransformer(
            cfg.hidden_size, cfg.num_hidden_layers, cfg.num_attention_heads,
            cfg.intermediate_size, self.dtype, name="transformer",
        )(x, up_mask)
        x = nn.Dense(
            self.out_dim, use_bias=cfg.decoder_out_bias, dtype=self.dtype,
            name="vertice_map_reverse",
        )(x)
        return x


class VQAutoEncoder(nn.Module):
    """Full codec. API:
        encode(motion, one_hot)           -> pre-quant latent tokens (B, L, D)
        quant(z, one_hot[, token_mask])   -> QuantizerOutput
        decode(z_q)                       -> motion (B, T, in_dim)
        __call__(x, template, one_hot)    -> (recon, quant_loss, perplexity)

    Reference: VQAutoEncoder in models/vq_vae_emotion.py:8-107 (and the plain
    variants). Template subtract/add wraps the codec like the reference's
    forward (vq_vae_emotion.py:43-53).
    """

    config: VQVAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = VQEncoder(cfg, self.dtype)
        self.decoder = VQDecoder(cfg, cfg.in_dim, self.dtype)
        self.codebook = self.param(
            "codebook",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / cfg.n_embed, maxval=1.0 / cfg.n_embed
            ),
            (cfg.n_embed, cfg.zquant_dim),
        )

    def encode(self, motion, one_hot=None, frame_mask=None):
        return self.encoder(motion, one_hot, frame_mask)

    def quant(self, z, one_hot=None, token_mask=None):
        return quant_lib.quantize(
            self.codebook,
            z,
            one_hot=one_hot,
            partitions=self.config.emotion_classes,
            beta=self.config.commitment_beta,
            token_mask=token_mask,
        )

    def decode(self, z_q, frame_mask=None):
        return self.decoder(z_q, frame_mask)

    def decode_indices(self, global_indices, frame_mask=None):
        """Indices -> motion (reference decode_to_img, vq_vae_emotion.py:89-96)."""
        z_q = quant_lib.codebook_lookup(self.codebook, global_indices)
        return self.decoder(z_q, frame_mask)

    # ---- token-level interface (reference models/vq_vae.py:56-130) ----

    def get_quant(self, motion, one_hot=None):
        """(quantized latents, indices) — reference get_quant (vq_vae.py:64-68)."""
        z = self.encode(motion, one_hot)
        q = self.quant(z, one_hot)
        return q.z_q, q.indices

    def get_distances(self, motion, one_hot=None):
        """Full codebook distances of the encoded motion (B, L, n_embed) —
        reference get_distances (vq_vae.py:70-73); deliberately UNsliced by
        emotion even for the partitioned codebook (quirk Q12)."""
        z = self.encode(motion, one_hot)
        return quant_lib.get_distances(self.codebook, z)

    def get_quant_from_d(self, d, frame_mask=None):
        """Distances -> argmin indices -> decoded motion — reference
        get_quant_from_d (vq_vae.py:75-78)."""
        indices = jnp.argmin(d, axis=-1).astype(jnp.int32)
        return self.decode_indices(indices, frame_mask)

    def entry_to_feature(self, indices):
        """Codebook rows for (global) indices — reference entry_to_feature
        (vq_vae.py:80-87)."""
        return quant_lib.codebook_lookup(self.codebook, indices)

    def decode_logit(self, logits, frame_mask=None):
        """Token logits (B, L, n_embed) -> top-1 indices -> motion —
        reference decode_logit (vq_vae.py:99-108)."""
        indices = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return self.decode_indices(indices, frame_mask)

    def __call__(self, x, template, one_hot=None, token_mask=None,
                 frame_mask=None):
        motion = x - template
        z = self.encode(motion, one_hot, frame_mask)
        q = self.quant(z, one_hot, token_mask)
        recon = self.decode(q.z_q, frame_mask) + template
        return recon, q.loss, q.perplexity
