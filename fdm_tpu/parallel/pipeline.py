"""Pipeline parallelism for the FDM denoiser (GPipe-style, shard_map).

The reference is single-GPU (SURVEY.md §2.5) and the FDM is small, so — like
TP/FSDP/SP — this is an optional TPU-native scaling axis: the decoder-layer
stack is split into S stages over a Mesh(('pipe',)); microbatches stream
through the stages with activations handed stage-to-stage by
`lax.ppermute` over ICI. The embedding (token regroup + conditioning) and
the output head stay replicated around the staged middle
(FDM.denoise_embed / denoise_head).

Schedule: the plain GPipe fill-drain loop — M microbatches over S stages in
M + S - 1 ticks; every stage computes every tick (idle ticks do throwaway
work on zeros), which keeps the program a single static `lax.scan`. Bubble
fraction is (S-1)/(M+S-1): choose M >= S.

All layers share one hyperparameter set, so one _DecoderLayer module
evaluates any layer's parameter subtree; a stage's layers run as a
`lax.scan` over its stacked parameters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _pvary(x, axis: str):
    """Mark `x` as device-varying over `axis` (newer jax type-checks the
    varying-manual-axes of shard_map scan carries); no-op on older jax."""
    try:
        return jax.lax.pcast(x, (axis,), to="varying")
    except (AttributeError, TypeError):
        pass
    try:
        return jax.lax.pvary(x, (axis,))
    except (AttributeError, TypeError):
        return x


def stack_decoder_layers(fdm_params, num_layers: int):
    """fdm params -> layer parameters stacked on a leading (num_layers,)
    axis (the non-layer params stay in fdm_params and are used as-is by
    denoise_embed / denoise_head, which never touch the layers)."""
    p = fdm_params["params"]
    layers = [p[f"layer_{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def make_pp_denoise(ld, mesh: Mesh, num_microbatches: int,
                    axis: str = "pipe"):
    """Build (denoise_fn, prepare_params).

    prepare_params(fdm_params) -> (fdm_params, staged) where `staged` holds
    the decoder-layer parameters reshaped to (S, layers_per_stage, ...) for
    sharding on the pipe axis. denoise_fn(fdm_params, staged, x_t, t,
    audio_feat, style, emo) reproduces FDM.denoise exactly in
    DETERMINISTIC (inference) mode — the pipeline path is sampling-only and
    never applies the decoder-layer dropout; training goes through the
    jitted DP/FSDP steps (fdm_tpu.train). denoise_fn(deterministic=False)
    raises rather than silently dropping the dropout regime."""
    from fdm_tpu.models.fdm import _DecoderLayer

    cfg = ld.config.fdm
    S = mesh.shape[axis]
    M = num_microbatches
    if cfg.num_layers % S != 0:
        raise ValueError(
            f"num_layers={cfg.num_layers} must divide into {S} pipeline "
            f"stages"
        )
    per_stage = cfg.num_layers // S
    layer = _DecoderLayer(
        cfg.feature_dim, cfg.n_head, cfg.ffn_dim, cfg.dropout, ld.fdm.dtype,
        ld.fdm.cross_mode, ld.fdm.self_attn_mode,
        alibi_period=cfg.alibi_period,
    )

    def prepare_params(fdm_params):
        stacked = stack_decoder_layers(fdm_params, cfg.num_layers)
        staged = jax.tree_util.tree_map(
            lambda x: x.reshape((S, per_stage) + x.shape[1:]), stacked
        )
        # strip the layer subtrees from the replicated tree: denoise_embed /
        # denoise_head never read them, and keeping them would hold the full
        # decoder stack in HBM on EVERY device alongside its stage shard —
        # negating the per-device memory saving pipeline staging exists for
        trimmed = dict(fdm_params)
        trimmed["params"] = {
            k: v for k, v in fdm_params["params"].items()
            if not k.startswith("layer_")
        }
        return trimmed, staged

    def _stage(stage_params, x, mem, bias):
        def body(h, lp):
            return layer.apply({"params": lp}, h, mem, bias, True), None

        x, _ = jax.lax.scan(body, x, stage_params)
        return x

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(),
    )
    def _run_layers(staged, xs, mems, bias):
        # staged arrives as the local (1, per_stage, ...) slice
        sp = jax.tree_util.tree_map(lambda v: v[0], staged)
        stage = jax.lax.axis_index(axis)
        # the carry becomes device-varying after the first tick (ppermute);
        # mark the zero-init the same way so the scan carry types match
        buf = _pvary(jnp.zeros_like(xs[0]), axis)
        outs = _pvary(jnp.zeros_like(xs), axis)
        fwd = [(i, i + 1) for i in range(S - 1)]

        def tick(carry, t):
            buf, outs = carry
            m = jnp.clip(t - stage, 0, M - 1)
            inp = jnp.where(stage == 0, xs[m], buf)
            out = _stage(sp, inp, mems[m], bias)
            # the last stage finishes microbatch t-(S-1) at tick t
            done = t - (S - 1)
            valid = (stage == S - 1) & (done >= 0)
            idx = jnp.clip(done, 0, M - 1)
            outs = outs.at[idx].set(jnp.where(valid, out, outs[idx]))
            buf = (
                jax.lax.ppermute(out, axis, fwd) if S > 1
                else jnp.zeros_like(out)
            )
            return (buf, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (buf, outs), jnp.arange(M + S - 1)
        )
        # results live on the last stage only; psum replicates them
        return jax.lax.psum(outs, axis)

    def denoise_fn(fdm_params, staged, x_t, t, audio_feat, style_one_hot,
                   emotion_one_hot=None, deterministic=True):
        if not deterministic:
            raise ValueError(
                "pipeline-parallel denoise is inference-only "
                "(deterministic); train with the DP/FSDP steps instead"
            )
        x, mem = ld.fdm.apply(
            fdm_params, x_t, t, audio_feat, style_one_hot, emotion_one_hot,
            method="denoise_embed",
        )
        bias = ld.fdm.apply(fdm_params, x.shape[1], method="alibi_bias")
        if bias is None:
            # fused mode ignores the bias operand; keep shard_map specs happy
            bias = jnp.zeros((1, 1, 1), x.dtype)
        B = x.shape[0]
        if B % M != 0:
            raise ValueError(
                f"batch {B} must be a multiple of num_microbatches={M}"
            )
        b = B // M
        xs = x.reshape((M, b) + x.shape[1:])
        mems = mem.reshape((M, b) + mem.shape[1:])
        y = _run_layers(staged, xs, mems, bias)
        y = y.reshape((B,) + y.shape[2:])
        return ld.fdm.apply(
            fdm_params, y, x_t.shape, method="denoise_head"
        )

    return denoise_fn, prepare_params
