"""FLAME LBS: Rodrigues vs scipy oracle, rigid-motion invariants, blendshape
linearity, landmark extraction, and the MEAD param->vertices decode."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from fdm_tpu.geometry import (
    batch_rodrigues,
    flame_forward,
    lbs,
    params_to_vertices,
    synthetic_flame_model,
    vertices_to_landmarks,
)


def test_rodrigues_matches_scipy():
    rng = np.random.RandomState(0)
    vecs = rng.randn(20, 3).astype(np.float32)
    ours = np.asarray(batch_rodrigues(jnp.asarray(vecs)))
    oracle = Rotation.from_rotvec(vecs).as_matrix()
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)
    # zero rotation -> identity
    eye = np.asarray(batch_rodrigues(jnp.zeros((1, 3))))
    np.testing.assert_allclose(eye[0], np.eye(3), atol=1e-6)


def test_rest_pose_returns_template():
    model = synthetic_flame_model()
    B, J = 2, model.num_joints
    betas = jnp.zeros((B, model.shapedirs.shape[-1]))
    pose = jnp.zeros((B, J * 3))
    verts, joints = lbs(model, betas, pose)
    np.testing.assert_allclose(
        verts, np.tile(np.asarray(model.v_template)[None], (B, 1, 1)),
        atol=1e-5,
    )
    expected_joints = np.einsum(
        "jv,vc->jc", np.asarray(model.j_regressor), np.asarray(model.v_template)
    )
    np.testing.assert_allclose(joints[0], expected_joints, atol=1e-5)


def test_blendshapes_are_linear_at_rest():
    model = synthetic_flame_model()
    rng = np.random.RandomState(1)
    betas = jnp.asarray(rng.randn(1, model.shapedirs.shape[-1]).astype(np.float32))
    pose = jnp.zeros((1, model.num_joints * 3))
    verts, _ = lbs(model, betas, pose)
    expected = np.asarray(model.v_template) + np.einsum(
        "l,vcl->vc", np.asarray(betas)[0], np.asarray(model.shapedirs)
    )
    np.testing.assert_allclose(verts[0], expected, rtol=1e-4, atol=1e-5)


def test_global_rotation_is_rigid():
    """Pure global (root) rotation must rigidly rotate the mesh about the
    root joint."""
    model = synthetic_flame_model()
    J = model.num_joints
    rotvec = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    pose = jnp.zeros((1, J * 3)).at[0, :3].set(jnp.asarray(rotvec))
    betas = jnp.zeros((1, model.shapedirs.shape[-1]))

    verts, _ = lbs(model, betas, pose)
    R = Rotation.from_rotvec(rotvec).as_matrix()
    template = np.asarray(model.v_template)
    root = np.einsum("v,vc->c", np.asarray(model.j_regressor)[0], template)
    expected = (template - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(verts[0]), expected, rtol=1e-4, atol=1e-5)


def test_child_joint_rotation_moves_only_weighted_vertices():
    model = synthetic_flame_model()
    J = model.num_joints
    # make vertex 0 fully bound to the root: it must not move under jaw (2)
    w = np.asarray(model.lbs_weights).copy()
    w[0] = 0.0
    w[0, 0] = 1.0
    model = model._replace(lbs_weights=jnp.asarray(w))
    pose = jnp.zeros((1, J * 3)).at[0, 6:9].set(jnp.asarray([0.4, 0.1, -0.2]))
    betas = jnp.zeros((1, model.shapedirs.shape[-1]))
    verts, _ = lbs(model, betas, pose)
    # vertex 0 moves only by the pose-corrective blendshape, not the rotation
    posedirs_contrib = np.abs(np.asarray(model.posedirs)).max() * 9
    delta = np.abs(np.asarray(verts[0, 0]) - np.asarray(model.v_template[0]))
    assert delta.max() < 0.2  # bounded by corrective, no rigid jaw swing


def test_flame_forward_padding_and_translation():
    model = synthetic_flame_model()
    B = 3
    shape = jnp.zeros((B, 100))
    expr = jnp.zeros((B, 50))
    pose = jnp.zeros((B, 6))
    transl = jnp.asarray(np.random.RandomState(2).randn(B, 3).astype(np.float32))
    verts = flame_forward(model, shape, expr, pose, transl=transl)
    base = flame_forward(model, shape, expr, pose)
    np.testing.assert_allclose(
        verts, np.asarray(base) + np.asarray(transl)[:, None], atol=1e-6
    )


def test_params_to_vertices_jit_and_rounding():
    model = synthetic_flame_model()
    T = 11  # not a multiple of 8 — the reference would pad+chunk
    params = jnp.asarray(
        np.random.RandomState(3).randn(T, 56).astype(np.float32) * 0.1
    )
    f = jax.jit(lambda p: params_to_vertices(model, p))
    verts = f(params)
    assert verts.shape == (T, model.num_vertices * 3)
    rounded = params_to_vertices(model, params, round_decimals=4)
    assert np.abs(np.asarray(rounded) - np.asarray(verts)).max() <= 5e-5
    # rounding is idempotent at 1e-4 resolution
    r2 = np.round(np.asarray(rounded) * 1e4) / 1e4
    np.testing.assert_allclose(r2, rounded, atol=1e-9)


def test_landmark_extraction():
    model = synthetic_flame_model()
    verts = jnp.tile(model.v_template[None], (2, 1, 1))
    lmk = vertices_to_landmarks(
        verts, model.faces, model.lmk_faces_idx, model.lmk_bary_coords
    )
    assert lmk.shape == (2, len(model.lmk_faces_idx), 3)
    # barycentric mean of the face's vertices
    f0 = model.faces[model.lmk_faces_idx[0]]
    expected = np.asarray(model.v_template)[f0].mean(axis=0)
    np.testing.assert_allclose(lmk[0, 0], expected, rtol=1e-5)


# ---------------- dynamic contour landmarks ----------------
# Oracle: independent numpy/scipy replica of reference
# FLAME_PyTorch/FLAME.py:160-204 (_find_dynamic_lmk_idx_and_bcoords).

def _oracle_bucket(full_pose_row, parents):
    aa = np.asarray(full_pose_row).reshape(-1, 3)
    chain = [1, 0]  # neck, then its parent (root)
    rel = np.eye(3)
    for j in chain:
        rel = Rotation.from_rotvec(aa[j]).as_matrix() @ rel
    sy = np.sqrt(rel[0, 0] ** 2 + rel[1, 0] ** 2)
    euler_y = np.arctan2(-rel[2, 0], sy)
    y = int(np.round(min(-euler_y * 180.0 / np.pi, 39.0)))
    if y < -39:
        return 78
    if y < 0:
        return 39 - y
    return y


def test_rot_mat_to_euler_pure_yaw():
    from fdm_tpu.geometry import rot_mat_to_euler

    for deg in (-50, -10, 0, 15, 45):
        th = np.deg2rad(deg)
        R = Rotation.from_euler("y", th).as_matrix()
        got = float(rot_mat_to_euler(jnp.asarray(R[None]))[0])
        np.testing.assert_allclose(got, th, atol=1e-6)


def test_dynamic_bucket_selection_sweep():
    """Row selection matches the reference formula across a head-yaw sweep,
    including neck+global composition and the clamping branches."""
    from fdm_tpu.geometry import find_dynamic_lmk_idx_and_bcoords

    model = synthetic_flame_model()
    J = model.num_joints
    rng = np.random.RandomState(0)
    poses = []
    for deg in (-60, -39, -20, -1, 0, 1, 17, 39, 60):
        p = np.zeros((J, 3))
        p[0] = Rotation.from_euler("y", np.deg2rad(deg)).as_rotvec()
        p[1] = rng.randn(3) * 0.1  # non-trivial neck pose composes in
        poses.append(p.reshape(-1))
    full_pose = jnp.asarray(np.stack(poses), jnp.float32)

    dyn_idx, dyn_bary = find_dynamic_lmk_idx_and_bcoords(model, full_pose)
    assert dyn_idx.shape == (len(poses), 17)
    assert dyn_bary.shape == (len(poses), 17, 3)
    for i, p in enumerate(poses):
        b = _oracle_bucket(p, model.parents)
        np.testing.assert_array_equal(
            np.asarray(dyn_idx[i]), model.dynamic_lmk_faces_idx[b]
        )
        np.testing.assert_allclose(
            np.asarray(dyn_bary[i]), model.dynamic_lmk_bary_coords[b],
            rtol=1e-6,
        )


def test_flame_forward_returns_vertices_and_landmarks():
    """Reference forward contract: (vertices, landmarks) with 17 contour +
    static landmarks, pose-dependent contour, translation applied to both."""
    model = synthetic_flame_model()
    B = 2
    shape = jnp.zeros((B, 100))
    expr = jnp.zeros((B, 50))
    yaw = Rotation.from_euler("y", np.deg2rad(-25)).as_rotvec()
    pose = jnp.asarray(
        np.stack([np.zeros(6), np.concatenate([yaw, np.zeros(3)])]),
        jnp.float32,
    )
    n_static = len(model.lmk_faces_idx)

    verts, lmk = flame_forward(
        model, shape, expr, pose, return_landmarks=True
    )
    assert verts.shape == (B, model.num_vertices, 3)
    assert lmk.shape == (B, 17 + n_static, 3)

    # contour rows differ between yaw=0 and yaw=-25 (different buckets)...
    assert not np.allclose(np.asarray(lmk[0, :17]), np.asarray(lmk[1, :17]))
    # ...and the zero-pose contour equals bucket-0 barycentric extraction
    dyn0 = vertices_to_landmarks(
        verts[:1], model.faces, model.dynamic_lmk_faces_idx[0],
        model.dynamic_lmk_bary_coords[0],
    )
    np.testing.assert_allclose(
        np.asarray(lmk[0, :17]), np.asarray(dyn0[0]), rtol=1e-5
    )

    # use_face_contour=False -> static only (reference config flag)
    _, lmk_s = flame_forward(
        model, shape, expr, pose, return_landmarks=True,
        use_face_contour=False,
    )
    assert lmk_s.shape == (B, n_static, 3)
    np.testing.assert_allclose(
        np.asarray(lmk[:, 17:]), np.asarray(lmk_s), rtol=1e-6
    )

    # translation shifts vertices and landmarks together
    t = jnp.asarray([[0.1, -0.2, 0.3]] * B)
    v_t, l_t = flame_forward(
        model, shape, expr, pose, transl=t, return_landmarks=True
    )
    np.testing.assert_allclose(
        np.asarray(v_t), np.asarray(verts + t[:, None]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(l_t), np.asarray(lmk + t[:, None]), rtol=1e-5
    )


def test_dynamic_landmarks_jittable():
    model = synthetic_flame_model()
    B = 3
    fwd = jax.jit(
        lambda s, e, p: flame_forward(
            model, s, e, p, return_landmarks=True
        )
    )
    verts, lmk = fwd(
        jnp.zeros((B, 100)), jnp.zeros((B, 50)),
        jax.random.normal(jax.random.PRNGKey(0), (B, 6)) * 0.3,
    )
    assert np.isfinite(np.asarray(lmk)).all()
    assert lmk.shape[1] == 17 + len(model.lmk_faces_idx)
