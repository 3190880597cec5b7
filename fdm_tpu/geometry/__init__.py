from fdm_tpu.geometry.flame import (
    FlameModel,
    load_flame_model,
    synthetic_flame_model,
    batch_rodrigues,
    lbs,
    flame_forward,
    find_dynamic_lmk_idx_and_bcoords,
    neck_kin_chain,
    rot_mat_to_euler,
    params_to_vertices,
    vertices_to_landmarks,
)

__all__ = [
    "FlameModel",
    "load_flame_model",
    "synthetic_flame_model",
    "batch_rodrigues",
    "lbs",
    "flame_forward",
    "find_dynamic_lmk_idx_and_bcoords",
    "neck_kin_chain",
    "rot_mat_to_euler",
    "params_to_vertices",
    "vertices_to_landmarks",
]
