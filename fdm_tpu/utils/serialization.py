"""Single-file parameter serialization (msgpack via flax).

Orbax (fdm_tpu.utils.checkpoint) owns training checkpoints (params +
optimizer state + step with retention); this module is for standalone
parameter artifacts — trained stage-1/stage-2 weights consumed by the
sample/demo CLIs, mirroring the reference's model-{epoch}.mpt /
model.pth.tar files (reference train/train_mead_vqvae.py:147-153)."""

from __future__ import annotations

import os

import flax.serialization
import jax
import numpy as np


def save_params(path: str, params) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, params)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(params))


def load_params(path: str):
    with open(path, "rb") as f:
        restored = flax.serialization.msgpack_restore(f.read())
    # device arrays, not numpy: numpy leaves break tracer-indexed lookups
    # (codebook[indices]) and force a host->device copy per jit call
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, restored)


def fill_missing(params, template, label: str = "params"):
    """Add leaves that `template` (a fresh module init) has but `params`
    (a restored artifact) lacks — forward compatibility for artifacts saved
    before a parameter existed (e.g. audio encoders converted before the
    SpecAugment `masked_spec_embed` param was introduced). Returns a new
    tree; prints each filled path."""
    filled = []

    def rec(p, t, path):
        for k, tv in t.items():
            if isinstance(tv, dict):
                if k in p and not isinstance(p[k], dict):
                    # artifact stored a leaf where the current module has a
                    # subtree — irreconcilable; take the fresh subtree so
                    # the model at least loads, and say so
                    p[k] = tv
                    filled.append("/".join(path + (str(k), "(replaced)")))
                else:
                    rec(p.setdefault(k, {}), tv, path + (str(k),))
            elif k not in p:
                p[k] = tv
                filled.append("/".join(path + (str(k),)))

    # identity tree_map rebuilds fresh CONTAINERS (all rec() mutates) while
    # sharing the weight arrays — deep-copying them would double peak host
    # memory for a HuBERT-large tree on every pre-upgrade-artifact load
    out = jax.tree_util.tree_map(lambda x: x, params)
    rec(out, template, ())
    if filled:
        print(
            f"{label}: filled {len(filled)} missing parameter(s) from "
            f"fresh init (pre-upgrade artifact): {', '.join(filled)}"
        )
    return out
