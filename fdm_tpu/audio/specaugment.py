"""SpecAugment-style span masking for the audio encoders.

TPU-native reimplementation of the reference's mask generator
(reference models/wav2vec.py:11-58 `_compute_mask_indices`) and its
training-time application (reference models/wav2vec.py:109-127,
models/hubert.py:112-130): mask ``mask_prob * seq_len / mask_length`` spans
of ``mask_length`` consecutive frames per example, replace masked frames
with a learned embedding (time) or zeros (feature channels).

The reference generator is host-side numpy with data-dependent shapes; here
it is a pure function of a PRNG key with STATIC shapes so it lives inside
the jitted train step:

  * the span count ``floor(x) + Bernoulli(frac(x))`` (reference line 21-24's
    ``int(x + rand())``) is drawn once and shared across the batch, exactly
    like the no-padding path of the reference;
  * starts are drawn without replacement via the uniform-scores top-k trick
    (equivalent in distribution to ``np.random.choice(domain, n,
    replace=False)``);
  * the reference's final equalization step (subsample every row down to the
    batch-min masked count, lines 53-57) is reproduced with a per-row
    random-score threshold.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


def _span_budget(
    mask_prob: float, seq_len: int, mask_length: int, min_masks: int
) -> Tuple[int, int, float]:
    """Static span-count bookkeeping: (floor, max possible, frac prob)."""
    if mask_length < 1:
        raise ValueError(f"mask_length must be >= 1, got {mask_length}")
    if mask_length >= seq_len:
        raise ValueError(
            f"mask_length {mask_length} must be < seq_len {seq_len}"
        )
    x = mask_prob * seq_len / float(mask_length)
    base = int(x)
    n_max = max(base + 1, min_masks)
    return base, n_max, x - base


def expand_spans(
    starts: jnp.ndarray,     # (B, n_max) int32 span start indices
    num_active: jnp.ndarray,  # scalar int32: how many of n_max are live
    seq_len: int,
    mask_length: int,
) -> jnp.ndarray:
    """Expand span starts into a boolean (B, seq_len) mask — the JAX
    counterpart of reference models/wav2vec.py:50-51 (offset expansion +
    ``mask_idc < sz`` filter). Shared by the sampler and the parity tests."""
    B, n_max = starts.shape
    offs = jnp.arange(mask_length)[None, None, :]
    idx = starts[:, :, None] + offs                       # (B, n_max, L)
    active = (jnp.arange(n_max) < num_active)[None, :, None]
    val = active & (idx < seq_len)
    idx_c = jnp.minimum(idx, seq_len - 1)
    b_idx = jnp.arange(B)[:, None, None]
    return (
        jnp.zeros((B, seq_len), jnp.bool_).at[b_idx, idx_c].max(val)
    )


def compute_mask_indices(
    key: jax.Array,
    shape: Tuple[int, int],
    mask_prob: float,
    mask_length: int,
    min_masks: int = 0,
) -> jnp.ndarray:
    """Boolean (batch, seq_len) span mask matching the reference generator's
    distribution (reference models/wav2vec.py:11-58, no-padding path)."""
    B, sz = shape
    base, n_max, frac = _span_budget(mask_prob, sz, mask_length, min_masks)
    k_extra, k_starts, k_eq = jax.random.split(key, 3)

    num_mask = jnp.maximum(
        base + jax.random.bernoulli(k_extra, frac).astype(jnp.int32),
        min_masks,
    )
    # reference lines 45-47: shrink the start-domain guard for tiny seqs
    min_len = jnp.where(
        sz - mask_length <= num_mask, sz - num_mask - 1, mask_length
    )
    domain = sz - min_len  # starts drawn uniformly from [0, domain)

    # choice-without-replacement via top-k over uniform scores, restricted
    # to the first `domain` positions (domain is traced, so mask the tail)
    scores = jax.random.uniform(k_starts, (B, sz))
    scores = jnp.where(jnp.arange(sz)[None, :] < domain, scores, -jnp.inf)
    _, starts = jax.lax.top_k(scores, n_max)              # (B, n_max)

    mask = expand_spans(starts.astype(jnp.int32), num_mask, sz, mask_length)

    # equalization (reference lines 53-57): every row keeps exactly the
    # batch-min masked count, dropping uniformly-random masked positions
    counts = jnp.sum(mask, axis=-1)
    m_min = jnp.min(counts)
    eq_scores = jnp.where(
        mask, jax.random.uniform(k_eq, (B, sz)), -jnp.inf
    )
    order = jnp.sort(eq_scores, axis=-1)[:, ::-1]         # descending
    thresh_idx = jnp.maximum(m_min - 1, 0)
    thresh = jnp.take_along_axis(
        order, jnp.full((B, 1), thresh_idx), axis=-1
    )
    return jnp.where(m_min > 0, eq_scores >= thresh, False)


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    """Masking knobs, defaults per the HF checkpoints the reference loads
    (facebook/wav2vec2-base-960h, facebook/hubert-large-ls960-ft)."""

    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2   # reference hard-codes min_masks=2
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10


def sample_masks(
    key: jax.Array,
    batch: int,
    seq_len: int,
    hidden_size: int,
    cfg: SpecAugmentConfig,
):
    """Draw (time_mask, feature_mask) for one training step; either may be
    None when its prob is 0 (reference models/hubert.py:114-130)."""
    kt, kf = jax.random.split(key)
    # sequences no longer than one span can't be masked (the reference would
    # raise here; tiny smoke configs skip masking instead)
    time_mask = (
        compute_mask_indices(
            kt, (batch, seq_len), cfg.mask_time_prob, cfg.mask_time_length,
            min_masks=cfg.mask_time_min_masks,
        )
        if cfg.mask_time_prob > 0 and seq_len > cfg.mask_time_length
        else None
    )
    feature_mask = (
        compute_mask_indices(
            kf, (batch, hidden_size), cfg.mask_feature_prob,
            cfg.mask_feature_length,
        )
        if cfg.mask_feature_prob > 0 and hidden_size > cfg.mask_feature_length
        else None
    )
    return time_mask, feature_mask
