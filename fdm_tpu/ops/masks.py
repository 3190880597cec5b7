"""Attention bias masks: ALiBi-style temporal bias, alignment masks, length masks.

All pure functions returning numpy/jnp arrays; the Pallas fused-attention
kernel regenerates the same biases on the fly (fdm_tpu/kernels/attention.py).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

NEG_INF = float("-inf")


def alibi_slopes(n_head: int) -> np.ndarray:
    """ALiBi head slopes (geometric series; non-power-of-2 head counts get the
    interleaved construction). Matches reference get_slopes
    (models/fdm_vqvae_mead.py:133-142)."""

    def power_of_2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n_head).is_integer():
        return np.asarray(power_of_2(n_head), dtype=np.float32)
    closest = 2 ** math.floor(math.log2(n_head))
    return np.asarray(
        power_of_2(closest)
        + alibi_slopes(2 * closest).tolist()[0::2][: n_head - closest],
        dtype=np.float32,
    )


def alibi_biased_mask(n_head: int, max_seq_len: int, period: int) -> np.ndarray:
    """Causal mask + period-bucketed ALiBi bias, shape (n_head, L, L).

    Parity with reference init_biased_mask (models/fdm_vqvae_mead.py:131-153):
    relative distance is bucketed by `period` (floor((i-j)/period) for j<=i),
    scaled by per-head slopes, with -inf above the diagonal.
    """
    slopes = alibi_slopes(n_head)
    # bias vector: floor(k / period) for k = 0..L-1, flipped and negated, so
    # row i reads [-floor(i/period), ..., -1//p, 0] over its causal span.
    bias = -(np.arange(max_seq_len) // period).astype(np.float32)
    bias = bias[::-1]
    alibi = np.zeros((max_seq_len, max_seq_len), dtype=np.float32)
    for i in range(max_seq_len):
        alibi[i, : i + 1] = bias[max_seq_len - (i + 1):]
    alibi = slopes[:, None, None] * alibi[None]
    causal = np.triu(np.full((max_seq_len, max_seq_len), NEG_INF), k=1).astype(
        np.float32
    )
    return causal[None] + alibi


def enc_dec_diagonal_allowed(T: int, S: int) -> np.ndarray:
    """Boolean (T, S) cross-attention mask: True = attendable.

    The reference memory mask allows ONLY the aligned audio frame
    (reference models/fdm.py:156-164 builds mask[i, i] = 0 with torch's
    True-means-masked convention). Softmax over a single allowed entry is
    identity, which the fast denoiser path exploits by bypassing
    cross-attention entirely (see fdm_tpu/models/fdm.py).
    """
    allowed = np.zeros((T, S), dtype=bool)
    idx = np.arange(min(T, S))
    allowed[idx, idx] = True
    return allowed


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B, max_len) float mask: 1 where position < length."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)
