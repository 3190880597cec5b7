"""FDM — the Facial Denoiser Model (stage-2 transformer denoiser).

One configurable flax module covering the reference's three variants
(models/fdm.py [BIWI], fdm_vocaset.py [VOCASET], fdm_vqvae_mead.py [MEAD]),
decoder architecture only — the reference's struct='Enc' branch collapses the
whole sequence to a single output token (reference models/fdm.py:86-91,
feat_out[-1:]) and is vestigial; every demo builds struct='Dec'
(reference demo/demo_biwi.py:37).

TPU-first redesign (numerically exact w.r.t. the reference denoiser):

  * the audio encoder and the audio_extract projection are HOISTED out of the
    denoise step: `prepare_audio` runs once per clip; the per-step `denoise`
    only adds the timestep embedding (the reference recomputes HuBERT + the
    projection in all 1000 steps, reference fdm_vqvae_mead.py:70-79);
  * the diagonal-only cross-attention memory mask means softmax over a single
    allowed key — cross-attention REDUCES to out_proj(v_proj(audio_t)) per
    frame. The fast path computes exactly that: two (T, D) GEMMs instead of a
    masked (T, S) attention. `cross_mode='full'` keeps the general masked
    implementation for non-diagonal masks;
  * timestep embedding is a table lookup (one-hot(1000) @ W == W[t]);
  * ALiBi causal bias is a precomputed (H, L, L) table sliced per length —
    padding always sits at the sequence tail, so causal masking already
    isolates valid queries from padded keys.

Parameter tree matches fdm_tpu.utils.torch_import.convert_fdm for direct
loading of reference stage-2 checkpoints.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fdm_tpu.configs import FDMConfig
from fdm_tpu.ops.basic import mish
from fdm_tpu.ops.masks import alibi_biased_mask
from fdm_tpu.ops.positional import periodic_positional_encoding, sinusoidal_table


class TorchMHA(nn.Module):
    """Multi-head attention with torch nn.MultiheadAttention semantics
    (per-head 1/sqrt(head_dim) scaling, packed-equivalent q/k/v/out Denses,
    and training-time dropout ON THE SOFTMAX WEIGHTS — torch MHA applies
    `dropout` to the attention probabilities, F.multi_head_attention_forward,
    which the reference enables via nn.TransformerDecoderLayer(dropout=0.1),
    reference models/fdm_vqvae_mead.py:46-47)."""

    dim: int
    n_head: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    def setup(self):
        D = self.dim
        self.q = nn.Dense(D, dtype=self.dtype)
        self.k = nn.Dense(D, dtype=self.dtype)
        self.v = nn.Dense(D, dtype=self.dtype)
        self.out = nn.Dense(D, dtype=self.dtype)
        self.weight_drop = nn.Dropout(rate=self.dropout)

    def __call__(self, x, mem, bias: Optional[jnp.ndarray] = None,
                 fused_alibi_period: Optional[int] = None,
                 deterministic: bool = True,
                 self_attention: Optional[bool] = None):
        """x: (B, T, D) queries; mem: (B, S, D) keys/values;
        bias: additive attention bias (H, T, S) or (T, S).
        fused_alibi_period: when set (self-attention only), dispatch to the
        Pallas fused causal-ALiBi kernel instead of adding `bias`.
        self_attention: pins the packed-QKV dispatch explicitly; when None
        it falls back to object identity (x is mem) — call sites that care
        about the packed path should pass it rather than rely on aliasing."""
        D, H = self.dim, self.n_head
        hd = D // H
        if self_attention is None:
            self_attention = x is mem
        if self_attention and not self.is_initializing():
            # self-attention: pack q/k/v into ONE (D, 3D) GEMM — each
            # output element is the same dot product (bit-equal), the
            # kernel concat is loop-invariant (hoisted out of sampler
            # scans by XLA), and one wide matmul tiles the MXU better
            # than three D x D ones at small T. (During init the unpacked
            # Denses run so their params get created.)
            p = self.q.variables["params"]
            pk = self.k.variables["params"]
            pv = self.v.variables["params"]
            W = jnp.concatenate(
                [p["kernel"], pk["kernel"], pv["kernel"]], axis=1
            ).astype(self.dtype)
            b = jnp.concatenate(
                [p["bias"], pk["bias"], pv["bias"]]
            ).astype(self.dtype)
            q, k, v = jnp.split(x @ W + b, 3, axis=-1)
        else:
            q = self.q(x)
            k = self.k(mem)
            v = self.v(mem)
        B, T, _ = q.shape
        S = k.shape[1]
        q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        if fused_alibi_period is not None:
            from fdm_tpu.kernels import alibi_attention

            if not deterministic and self.dropout > 0.0:
                raise ValueError(
                    "fused attention is an inference path: it never "
                    "materializes the softmax weights, so weight dropout "
                    "cannot be applied — train with self_attn_mode='table'"
                )
            out = alibi_attention(q, k, v, fused_alibi_period)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
            return self.out(out)
        logits = jnp.einsum("bhid,bhjd->bhij", q, k) * (hd**-0.5)
        if bias is not None:
            if bias.ndim == 2:
                bias = bias[None]
            logits = logits + bias[None].astype(logits.dtype)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        if self.dropout > 0.0:
            # torch drops the probabilities themselves; rows no longer sum
            # to 1 (surviving entries rescaled by 1/(1-p))
            attn = self.weight_drop(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return self.out(out)


class AlignedCrossAttention(nn.Module):
    """Exact evaluation of cross-attention under the reference's diagonal-only
    memory mask (fdm_tpu.ops.masks.enc_dec_diagonal_allowed): the only
    attendable key for frame t is audio frame t, so softmax weight is 1 and
    the q/k projections cancel out of the math. Parameters q/k still exist so
    reference checkpoints load; they are unused in this mode.

    Training-time weight dropout stays representable: torch applies dropout
    to the (B, H, T, S) probability matrix, whose only nonzero entry per
    (b, h, t) row is the diagonal weight 1 — Bernoulli-dropping that single
    weight with 1/(1-p) rescale is mathematically identical, implemented as
    a per-(b, t, h) mask on the head-split values."""

    dim: int
    n_head: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    def setup(self):
        D = self.dim
        # q/k are mathematically cancelled by the singleton softmax; they
        # stay registered so reference checkpoints load (XLA DCEs the GEMMs)
        self.q = nn.Dense(D, dtype=self.dtype)
        self.k = nn.Dense(D, dtype=self.dtype)
        self.v = nn.Dense(D, dtype=self.dtype)
        self.out = nn.Dense(D, dtype=self.dtype)
        self.weight_drop = nn.Dropout(rate=self.dropout)

    def __call__(self, x, mem, deterministic: bool = True):
        D, H = self.dim, self.n_head
        _ = self.q(x)
        _ = self.k(mem)
        v = self.v(mem)
        if self.dropout > 0.0 and not deterministic:
            B, S, _ = v.shape
            # one Bernoulli per (batch, frame, head) — exactly the diagonal
            # of torch's per-element weight dropout — broadcast over head_dim
            w = self.weight_drop(
                jnp.ones((B, S, H, 1), v.dtype), deterministic=False
            )
            v = (v.reshape(B, S, H, D // H) * w).reshape(B, S, D)
        return self.out(v)

    def audio_term(self, audio_feat):
        """Bias-free (audio @ Wv) @ Wo — the STEP-INVARIANT part of the
        diagonal cross attention under the linear split
        out(v(audio + time)) = audio@Wv@Wo + ((time@Wv + bv)@Wo + bo).
        Computed once per clip; the sampler scan only evaluates time_term."""
        h = audio_feat @ self.v.variables["params"]["kernel"].astype(self.dtype)
        return h @ self.out.variables["params"]["kernel"].astype(self.dtype)

    def time_term(self, time_vec):
        """(B, D) step-dependent remainder, carrying both biases."""
        return self.out(self.v(time_vec))


class FDM(nn.Module):
    config: FDMConfig
    dtype: jnp.dtype = jnp.float32
    cross_mode: str = "fast"  # "fast" (diagonal-exact) | "full" (masked attn)
    self_attn_mode: str = "table"  # "table" (dense ALiBi bias) | "fused"
                                   # (Pallas kernel, regenerates the bias)
    remat: bool = False  # rematerialize decoder layers (memory <- FLOPs,
                         # for long sequences / large batches)

    def setup(self):
        cfg = self.config
        D = cfg.feature_dim
        self.audio_extract_0 = nn.Dense(D, dtype=self.dtype)
        self.audio_extract_2 = nn.Dense(D, dtype=self.dtype)
        self.time_embed = nn.Dense(D, dtype=self.dtype)  # kernel is the table
        self.style_embed = nn.Dense(D, dtype=self.dtype)
        if cfg.emotion_classes:
            self.emotion_embed = nn.Dense(D, dtype=self.dtype)
        self.latent_encoder = nn.Dense(D, dtype=self.dtype)
        self.latent_decoder = nn.Dense(
            D, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )
        # the reference's PositionalEncoding/PeriodicPositionalEncoding end
        # with nn.Dropout(0.1) on the PE-added features, live in forward
        # (fdm_vqvae_mead.py:97,203; fdm_vocaset.py:42,166) — train-mode only
        self.pe_drop = nn.Dropout(cfg.dropout)
        layer_cls = (
            nn.remat(_DecoderLayer, static_argnums=(4,))
            if self.remat else _DecoderLayer
        )
        layers = []
        for i in range(cfg.num_layers):
            layers.append(
                layer_cls(
                    D, cfg.n_head, cfg.ffn_dim, cfg.dropout, self.dtype,
                    self.cross_mode, self.self_attn_mode,
                    alibi_period=cfg.alibi_period, name=f"layer_{i}",
                )
            )
        self.layers = layers

        # fused mode regenerates the bias inside the Pallas kernel; building
        # the (H, L, L) table anyway would bake an O(L^2) HLO constant into
        # every program (66 MB at L=1440) and defeat the flash path's point
        self._alibi = (
            None if self.self_attn_mode == "fused"
            else alibi_biased_mask(cfg.n_head, cfg.max_seq_len, cfg.alibi_period)
        )
        if cfg.positional_encoding == "periodic":
            self._pe = periodic_positional_encoding(cfg.pe_period, D, cfg.max_seq_len)
        else:
            self._pe = sinusoidal_table(cfg.max_seq_len, D)

    def prepare_audio(self, audio_hidden: jnp.ndarray) -> jnp.ndarray:
        """Project encoder hidden states to denoiser features — ONCE per clip.

        audio_hidden: (B, N, audio_dim) at the encoder frame rate (already
        paired/interpolated to the animation frame rate by fdm_tpu.audio).
        Reference equivalent: the audio reshape + audio_extract MLP re-run
        per denoise step (fdm_vqvae_mead.py:73-79).
        """
        x = self.audio_extract_0(audio_hidden)
        x = mish(x)
        return self.audio_extract_2(x)

    def _time_embedding(self, t: jnp.ndarray) -> jnp.ndarray:
        """(B,) int32 -> (B, D) timestep embedding.

        Reference builds a dense one-hot(1000) and a Linear+Mish
        (fdm_vqvae_mead.py:27-32); one_hot @ W is a (B,1000)x(1000,D) GEMM —
        trivial on the MXU and exactly a row lookup of the kernel."""
        one_hot = jax.nn.one_hot(
            t, self.config.num_timesteps, dtype=self.dtype
        )
        return mish(self.time_embed(one_hot))

    def denoise_embed(
        self,
        x_t: jnp.ndarray,                # (B, T*tokens_per_frame, zquant)
        t: jnp.ndarray,                  # (B,) int32
        audio_feat: jnp.ndarray,         # (B, T, D) from prepare_audio
        style_one_hot: jnp.ndarray,      # (B, style_classes)
        emotion_one_hot: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Everything before the decoder-layer stack: token regroup, latent
        encoder, style/emotion/time conditioning, PE (+ the reference's
        train-mode PE dropout). Returns (x, mem) ready for the layers —
        split out so the pipeline-parallel runner (fdm_tpu.parallel.pipeline)
        can stage the layer stack separately."""
        cfg = self.config
        B, L, C = x_t.shape
        tpf = cfg.tokens_per_frame
        # token-major -> frame-major (B, T, tokens*zquant == feature_dim)
        x = x_t.reshape(B, L // tpf, tpf * C)
        T = x.shape[1]

        if audio_feat.shape[1] != T:
            raise ValueError(
                f"audio_feat frames ({audio_feat.shape[1]}) must match latent "
                f"frames ({T}); align/trim in the data pipeline"
            )

        x = self.latent_encoder(x)
        if cfg.latent_encoder_mish:
            x = mish(x)

        style = self.style_embed(style_one_hot.astype(self.dtype))
        if cfg.style_mish:
            # BIWI wraps the style Linear in Mish (reference models/fdm.py:34-37)
            style = mish(style)
        x = x + style[:, None, :]
        if cfg.emotion_classes:
            if emotion_one_hot is None:
                raise ValueError("emotion-conditioned FDM requires emotion_one_hot")
            emo = self.emotion_embed(emotion_one_hot.astype(self.dtype))
            if cfg.adain_conditioning:
                x = _adain_channels(x, emo)
            else:
                x = x + emo[:, None, :]

        time = self._time_embedding(t)                       # (B, D)
        if cfg.adain_conditioning:
            mem = _adain_channels(audio_feat, time)
        else:
            mem = audio_feat + time[:, None, :]

        x = x + jnp.asarray(self._pe[:T], dtype=x.dtype)[None]
        x = self.pe_drop(x, deterministic=deterministic)
        return x, mem

    def alibi_bias(self, T: int):
        """(H, T, T) causal-ALiBi self-attention bias slice (None in fused
        mode — the Pallas kernel regenerates the bias on the fly)."""
        if self._alibi is None:
            return None
        return jnp.asarray(self._alibi[:, :T, :T])

    def denoise_head(self, x: jnp.ndarray, token_shape) -> jnp.ndarray:
        """Output projection + frame-major -> token-major regroup."""
        B, L, C = token_shape
        x = self.latent_decoder(x)
        return x.reshape(B, L, C)

    def prepare_cross(self, audio_feat: jnp.ndarray):
        """Per-layer STEP-INVARIANT cross-attention audio terms — computed
        once per clip, carried through the sampling scan as loop constants.

        Under the diagonal memory mask the cross attention reduces to
        out(v(audio_feat + time)) per layer (AlignedCrossAttention); v/out
        are linear, so the audio part never changes across denoise steps.
        Hoisting it removes two (T, D)x(D, D) GEMMs per layer per step from
        the reference's hottest loop (1000-step DDPM); the per-step
        remainder is a (B, D) vector op. Mathematically exact; fp
        reassociation only (measured ~1e-6 vs the unhoisted path)."""
        if self.cross_mode != "fast":
            raise ValueError("prepare_cross requires cross_mode='fast'")
        if self.config.adain_conditioning:
            raise ValueError(
                "adain conditioning mixes audio and time nonlinearly — the "
                "cross-attention hoist does not apply"
            )
        return [layer.cross_attn.audio_term(audio_feat)
                for layer in self.layers]

    def denoise(
        self,
        x_t: jnp.ndarray,                # (B, T*tokens_per_frame, zquant)
        t: jnp.ndarray,                  # (B,) int32
        audio_feat: jnp.ndarray,         # (B, T, D) from prepare_audio
        style_one_hot: jnp.ndarray,      # (B, style_classes)
        emotion_one_hot: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        cross_audio=None,                # from prepare_cross (inference)
    ) -> jnp.ndarray:
        """One denoiser evaluation: predicts clean x0 latents from x_t."""
        x, mem = self.denoise_embed(
            x_t, t, audio_feat, style_one_hot, emotion_one_hot, deterministic
        )
        bias = self.alibi_bias(x.shape[1])
        if cross_audio is not None:
            # hoisted inference path: mem is unused (XLA DCEs its add);
            # each layer gets its per-clip audio term + the step's time vec
            time_vec = self._time_embedding(t)
            for layer, ca in zip(self.layers, cross_audio):
                x = layer(x, None, bias, deterministic, ca, time_vec)
        else:
            for layer in self.layers:
                x = layer(x, mem, bias, deterministic)
        return self.denoise_head(x, x_t.shape)

    def __call__(self, x_t, t, audio_hidden, style_one_hot,
                 emotion_one_hot=None, deterministic=True):
        """Convenience end-to-end forward (audio projection + denoise) —
        matches the reference FDM.forward contract. Samplers should instead
        call prepare_audio once and denoise per step."""
        audio_feat = self.prepare_audio(audio_hidden)
        return self.denoise(
            x_t, t, audio_feat, style_one_hot, emotion_one_hot, deterministic
        )


def _adain_channels(content: jnp.ndarray, style_vec: jnp.ndarray,
                    eps: float = 1e-5) -> jnp.ndarray:
    """Per-frame channel renormalization to a conditioning vector's
    statistics — the reference's dormant adaIN fusion
    (fdm_vqvae_mead.py:94-95 calls adaIN(features, cond.repeat(...)) whose
    (N, C, L) layout reduces over the feature axis per frame).

    content: (B, T, C); style_vec: (B, C)."""
    c_mean = jnp.mean(content, axis=-1, keepdims=True)
    c_std = jnp.sqrt(jnp.var(content, axis=-1, keepdims=True) + eps)
    s_mean = jnp.mean(style_vec, axis=-1)[:, None, None]
    s_std = jnp.sqrt(jnp.var(style_vec, axis=-1) + eps)[:, None, None]
    return (content - c_mean) / c_std * s_std + s_mean


class _DecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer (batch_first, post-LN, ReLU FFN):
    x += self_attn; LN1; x += cross_attn; LN2; x += FFN; LN3."""

    dim: int
    n_head: int
    ffn_dim: int
    dropout: float
    dtype: jnp.dtype
    cross_mode: str
    self_attn_mode: str = "table"
    alibi_period: int = 30

    def setup(self):
        self.self_attn = TorchMHA(
            self.dim, self.n_head, self.dtype, dropout=self.dropout
        )
        if self.cross_mode == "fast":
            self.cross_attn = AlignedCrossAttention(
                self.dim, self.n_head, self.dtype, dropout=self.dropout
            )
        else:
            self.cross_attn = TorchMHA(
                self.dim, self.n_head, self.dtype, dropout=self.dropout
            )
        self.linear1 = nn.Dense(self.ffn_dim, dtype=self.dtype)
        self.linear2 = nn.Dense(self.dim, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, mem, self_bias, deterministic=True,
                 cross_audio=None, time_vec=None):
        """cross_audio/time_vec (keyword-only in practice): the hoisted
        diagonal-cross-attention inputs — cross_audio is this layer's
        per-clip audio term (out(v(audio)), bias-free) and time_vec the
        (B, D) timestep embedding; together they replace the per-step
        out(v(mem)) evaluation exactly (linearity of v/out under the
        singleton softmax). Inference-only fast path."""
        if self.self_attn_mode == "fused":
            h = self.self_attn(
                x, x, fused_alibi_period=self.alibi_period,
                deterministic=deterministic, self_attention=True,
            )
        else:
            h = self.self_attn(x, x, self_bias, deterministic=deterministic,
                               self_attention=True)
        x = self.norm1(x + self.drop(h, deterministic=deterministic))
        if cross_audio is not None:
            if self.cross_mode != "fast" or not deterministic:
                raise ValueError(
                    "hoisted cross attention requires cross_mode='fast' "
                    "and deterministic inference"
                )
            h = cross_audio + self.cross_attn.time_term(time_vec)[:, None, :]
        elif self.cross_mode == "fast":
            h = self.cross_attn(x, mem, deterministic=deterministic)
        else:
            T, S = x.shape[1], mem.shape[1]
            # diagonal alignment: -inf off the diagonal (general path)
            allowed = jnp.eye(T, S, dtype=bool)
            bias = jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)
            h = self.cross_attn(x, mem, bias, deterministic=deterministic)
        x = self.norm2(x + self.drop(h, deterministic=deterministic))
        h = self.linear2(
            self.drop(
                nn.relu(self.linear1(x)), deterministic=deterministic
            )
        )
        x = self.norm3(x + self.drop(h, deterministic=deterministic))
        return x
