"""Positional encodings (pure functions returning tables)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """Standard transformer sin/cos table, shape (max_len, d_model).

    Matches the reference construction (models/fdm_vqvae_mead.py:186-198):
    even channels sin, odd channels cos, div_term over even channel indices.
    """
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: pe[:, 1::2].shape[1]])
    return pe


def periodic_positional_encoding(
    period: int, d_model: int, max_seq_len: int = 600
) -> np.ndarray:
    """VOCASET FDM's PeriodicPositionalEncoding (reference
    models/fdm_vocaset.py:169-184): a `period`-long sinusoidal table tiled to
    cover max_seq_len. Shape (ceil+1 tiles * period, d_model)."""
    base = sinusoidal_table(period, d_model)
    repeat_num = (max_seq_len // period) + 1
    return np.tile(base, (repeat_num, 1))


def reference_batch_pe_offset(d_model: int, batch_index: int = 0) -> np.ndarray:
    """The reference VQ-VAE's 'positional encoding' as actually executed.

    reference models/lib/base_models.py:286-301 registers pe with shape
    (max_len, 1, d) and indexes `pe[:x.size(0)]` where x is batch-major
    (B, L, d) — so each batch element b receives the CONSTANT vector
    sinusoidal_table[b] added to every position; with the reference's
    batch_size=1 training this is row 0 = [0, 1, 0, 1, ...]. No positional
    information reaches the VQ transformer. We reproduce this behavior for
    checkpoint/output parity (pos_mode='reference').
    """
    return sinusoidal_table(batch_index + 1, d_model)[batch_index]


def apply_pe(x: jnp.ndarray, table: np.ndarray) -> jnp.ndarray:
    """Add per-position encoding: x (B, L, D) + table[:L]."""
    return x + jnp.asarray(table)[None, : x.shape[1], :]
