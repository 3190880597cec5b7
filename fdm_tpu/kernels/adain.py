"""Adaptive instance normalization (adaIN), jnp + Pallas TPU kernel.

Capability parity with reference utiles/adaIN.py:4-38 (the reference defines
it for style-fusing audio/motion features; the call sites are commented out —
fdm_vqvae_mead.py:94-95 — but BASELINE.json's north star names the fused
adaIN path, so it ships as a first-class op). Layout follows the reference:
(B, C, L) with statistics over the length axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fdm_tpu.kernels._util import LANE as _LANE, round_up as _round_up


def instance_stats(x: jnp.ndarray, eps: float = 1e-5):
    """Per-(batch, channel) mean/std over the length axis of (B, C, L)
    (reference calc_mean_std, utiles/adaIN.py:4-12 — biased variance)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return mean, jnp.sqrt(var + eps)


def adain_xla(content: jnp.ndarray, style: jnp.ndarray,
              eps: float = 1e-5) -> jnp.ndarray:
    """(B, C, Lc), (B, C, Ls) -> content renormalized to style statistics."""
    c_mean, c_std = instance_stats(content, eps)
    s_mean, s_std = instance_stats(style, eps)
    return (content - c_mean) / c_std * s_std + s_mean


def _adain_kernel(c_ref, s_ref, out_ref, *, lc: int, ls: int, eps: float):
    c = c_ref[0].astype(jnp.float32)   # (C, Lcp)
    s = s_ref[0].astype(jnp.float32)   # (C, Lsp)
    C = c.shape[0]

    cmask = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1) < lc
    smask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < ls
    cz = jnp.where(cmask, c, 0.0)
    sz = jnp.where(smask, s, 0.0)

    c_mean = jnp.sum(cz, axis=1, keepdims=True) / lc
    c_var = jnp.sum(
        jnp.where(cmask, jnp.square(c - c_mean), 0.0), axis=1, keepdims=True
    ) / lc
    s_mean = jnp.sum(sz, axis=1, keepdims=True) / ls
    s_var = jnp.sum(
        jnp.where(smask, jnp.square(s - s_mean), 0.0), axis=1, keepdims=True
    ) / ls

    out = (c - c_mean) * jax.lax.rsqrt(c_var + eps)
    out = out * jnp.sqrt(s_var + eps) + s_mean
    out_ref[0] = out.astype(out_ref.dtype)


def adain_pallas(content: jnp.ndarray, style: jnp.ndarray,
                 eps: float = 1e-5, interpret: bool = False) -> jnp.ndarray:
    B, C, Lc = content.shape
    Ls = style.shape[-1]
    Cp = _round_up(C, 8)
    Lcp = _round_up(Lc, _LANE)
    Lsp = _round_up(Ls, _LANE)
    cp = jnp.pad(content, ((0, 0), (0, Cp - C), (0, Lcp - Lc)))
    sp = jnp.pad(style, ((0, 0), (0, Cp - C), (0, Lsp - Ls)))

    kernel = functools.partial(_adain_kernel, lc=Lc, ls=Ls, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Cp, Lcp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp, Lsp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Cp, Lcp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cp, Lcp), content.dtype),
        interpret=interpret,
    )(cp, sp)
    return out[:, :C, :Lc]


def adain(content: jnp.ndarray, style: jnp.ndarray, eps: float = 1e-5,
          use_pallas: Optional[bool] = None) -> jnp.ndarray:
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return adain_pallas(content, style, eps)
    return adain_xla(content, style, eps)
