"""Materialize the head-to-head dataset: the same synthetic correlated MEAD
records the fdm_tpu CLIs generate (same seed/universe), with FLAME params
decoded to 5023-vertex meshes by fdm_tpu's FlameDecoder on the host CPU and
cached as one npz per clip for the torch side.

Run with PYTHONPATH=/root/repo (CPU; no TPU needed):
    python runs_r5/headtohead/data_prep.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import h2h_config as H


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fdm_tpu.cli.common import FlameDecoder
    from fdm_tpu.data import synthetic_splits

    cfg = H.build_tpu_config()
    splits = synthetic_splits(
        cfg, num_train=H.SIZE, num_eval=max(2, H.SIZE // 8),
        min_frames=40, max_frames=120, seed=H.SEED, with_audio=True,
        mode="correlated",
    )
    flame = FlameDecoder(cfg, None, device=jax.devices("cpu")[0])

    os.makedirs(H.DATA_DIR, exist_ok=True)
    template = None
    for split in ("train", "valid", "test"):
        names = []
        for rec in splits[split]:
            verts = np.asarray(flame(rec.motion[None]))[0]  # (T, 15069)
            if template is None:
                template = np.asarray(
                    flame.template(1, rec.template.shape[-1])
                )[0]  # (1, 15069): zero-param FLAME mesh (both sides)
            np.savez(
                os.path.join(H.DATA_DIR, rec.name + ".npz"),
                vertices=verts.astype(np.float32),
                audio=rec.audio.astype(np.float32),
                emotion=rec.emotion_one_hot.astype(np.float32),
                style=rec.style_one_hot.astype(np.float32),
            )
            names.append(rec.name)
        with open(os.path.join(H.DATA_DIR, f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
        print(f"{split}: {len(names)} clips")
    np.save(os.path.join(H.DATA_DIR, "template.npy"),
            template.astype(np.float32))
    print("template", template.shape, "->", H.DATA_DIR)


if __name__ == "__main__":
    main()
