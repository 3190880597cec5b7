"""Pallas TPU kernel: fused self-attention with on-the-fly ALiBi-causal bias.

The FDM denoiser's self-attention adds a period-bucketed ALiBi bias under a
causal mask (reference init_biased_mask, models/fdm_vqvae_mead.py:131-153 —
the reference precomputes a dense (H, 600, 600) bias tensor and feeds torch
MultiheadAttention). Fused here: one kernel instance per (batch, head)
computes QK^T, regenerates the bias from indices (no HBM bias tensor at all),
and applies softmax+PV entirely in VMEM.

Sequence lengths in this framework are <=600 frames (bucketed), so a whole
(T, T) score tile fits comfortably in VMEM (<2 MB at T=640) — a single-tile
kernel beats a flash-style streaming kernel here: no online-softmax overhead
and every matmul is one MXU pass.

`alibi_attention` auto-dispatches: Pallas on TPU, identical-math XLA
elsewhere (and under `interpret=True` for CPU tests).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fdm_tpu.ops.masks import alibi_slopes

from fdm_tpu.kernels._util import LANE as _LANE, round_up as _round_up


def _attn_kernel(slope_ref, q_ref, k_ref, v_ref, out_ref, *, period: int,
                 t_valid: int, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    Tp = q.shape[0]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    i = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    # bias(i, j) = -slope * floor((i - j) / period) on the causal span
    bucket = jax.lax.div(i - j, jnp.int32(period))
    bias = -slope_ref[pl.program_id(0)] * bucket.astype(jnp.float32)
    allowed = (j <= i) & (j < t_valid)
    logits = jnp.where(allowed, logits + bias, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    out = out / jnp.sum(p, axis=-1, keepdims=True)
    out_ref[0] = out.astype(out_ref.dtype)


def alibi_attention_pallas(
    q: jnp.ndarray,                 # (B, H, T, hd)
    k: jnp.ndarray,
    v: jnp.ndarray,
    period: int,
    slopes: Optional[np.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused causal-ALiBi attention; returns (B, H, T, hd)."""
    B, H, T, hd = q.shape
    if slopes is None:
        slopes = alibi_slopes(H)
    Tp = _round_up(T, _LANE)
    hdp = _round_up(hd, _LANE)
    pad = ((0, 0), (0, 0), (0, Tp - T), (0, hdp - hd))
    qp = jnp.pad(q, pad).reshape(B * H, Tp, hdp)
    kp = jnp.pad(k, pad).reshape(B * H, Tp, hdp)
    vp = jnp.pad(v, pad).reshape(B * H, Tp, hdp)
    # full (B*H,) vector in SMEM (blocked SMEM specs must tile to (8, 128));
    # the kernel picks its row by program_id
    slope_arr = jnp.tile(jnp.asarray(slopes, jnp.float32), B)  # (B*H,)

    kernel = functools.partial(
        _attn_kernel, period=period, t_valid=T, scale=hd**-0.5
    )
    bh_spec = pl.BlockSpec(
        (1, Tp, hdp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bh_spec, bh_spec, bh_spec,
        ],
        out_specs=bh_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, hdp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * Tp * hdp,
            bytes_accessed=4 * B * H * Tp * hdp * 4,
            transcendentals=B * H * Tp * Tp,
        ),
        interpret=interpret,
    )(slope_arr, qp, kp, vp)
    return out.reshape(B, H, Tp, hdp)[:, :, :T, :hd]


def _flash_kernel(slope_ref, q_ref, k_ref, v_ref, out_ref, *, period: int,
                  t_valid: int, scale: float, block_k: int):
    """Streaming (flash) variant: one q block per program, online softmax
    over k blocks. K/V stay whole in VMEM (Tp*hd floats); the score tile is
    (block_q, block_k) — sequence length is bounded by K/V VMEM (~8k frames
    at hd=128), not by a (T, T) score tile."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale           # (BQ, hd)
    BQ, hd = q.shape
    slope = slope_ref[bh]

    q_rows = qi * BQ + jax.lax.broadcasted_iota(
        jnp.int32, (BQ, block_k), 0
    )
    # causal upper bound: the last k block any row of this q block can see
    num_kb = jax.lax.div(qi * BQ + BQ - 1, block_k) + 1

    def body(kb, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (BQ, BK)
        k_cols = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (BQ, block_k), 1
        )
        bucket = jax.lax.div(q_rows - k_cols, jnp.int32(period))
        bias = -slope * bucket.astype(jnp.float32)
        allowed = (k_cols <= q_rows) & (k_cols < t_valid)
        s = jnp.where(allowed, s + bias, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((BQ, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc0 = jnp.zeros((BQ, hd), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    out_ref[0] = (acc / l).astype(out_ref.dtype)


def alibi_attention_flash(
    q: jnp.ndarray,                 # (B, H, T, hd)
    k: jnp.ndarray,
    v: jnp.ndarray,
    period: int,
    slopes: Optional[np.ndarray] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Long-sequence causal-ALiBi attention (SURVEY.md §5.7: blockwise/flash
    attention is the idiomatic TPU answer to >600-frame generation, not
    multi-device sequence parallelism)."""
    B, H, T, hd = q.shape
    if slopes is None:
        slopes = alibi_slopes(H)
    # Tp must be divisible by BOTH block sizes: the grid is Tp // block_q
    # (a mere max() left tail q-blocks unwritten for non-divisible pairs)
    blk = math.lcm(block_q, block_k)
    Tp = _round_up(T, blk)
    hdp = _round_up(hd, _LANE)
    pad = ((0, 0), (0, 0), (0, Tp - T), (0, hdp - hd))
    qp = jnp.pad(q, pad).reshape(B * H, Tp, hdp)
    kp = jnp.pad(k, pad).reshape(B * H, Tp, hdp)
    vp = jnp.pad(v, pad).reshape(B * H, Tp, hdp)
    slope_arr = jnp.tile(jnp.asarray(slopes, jnp.float32), B)

    kernel = functools.partial(
        _flash_kernel, period=period, t_valid=T, scale=hd**-0.5,
        block_k=block_k,
    )
    q_spec = pl.BlockSpec(
        (1, block_q, hdp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, Tp, hdp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(B * H, Tp // block_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_spec, kv_spec, kv_spec,
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, hdp), q.dtype),
        cost_estimate=pl.CostEstimate(
            # QK^T + PV: two (Tp, Tp, hdp) GEMMs, same as the single-tile
            # kernel above
            flops=4 * B * H * Tp * Tp * hdp,
            bytes_accessed=4 * B * H * Tp * hdp * 4,
            transcendentals=B * H * Tp * Tp,
        ),
        interpret=interpret,
    )(slope_arr, qp, kp, vp)
    return out.reshape(B, H, Tp, hdp)[:, :, :T, :hd]


def alibi_attention_xla(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, period: int,
    slopes: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Identical math in plain XLA (fallback + test oracle)."""
    B, H, T, hd = q.shape
    if slopes is None:
        slopes = alibi_slopes(H)
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * (hd**-0.5)
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    bucket = ((i - j) // period).astype(jnp.float32)
    bias = -jnp.asarray(slopes, jnp.float32)[:, None, None] * bucket[None]
    logits = jnp.where(
        (j <= i)[None, None], logits.astype(jnp.float32) + bias[None], -jnp.inf
    )
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


def alibi_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, period: int,
    slopes: Optional[np.ndarray] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Causal ALiBi attention, (B, H, T, hd) -> (B, H, T, hd).

    use_pallas=None auto-selects the Pallas kernel on TPU backends; beyond
    ~1k frames the (T, T) single-tile kernel would exceed VMEM, so the
    streaming flash variant takes over."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        if q.shape[2] > 1024:
            return alibi_attention_flash(q, k, v, period, slopes)
        return alibi_attention_pallas(q, k, v, period, slopes)
    return alibi_attention_xla(q, k, v, period, slopes)
