"""VOCA camera-rig software renderer: perspective pinhole camera, the
raymond-style directional lighting, and smooth (vertex-normal Gouraud)
shading with a z-buffer.

Reproduces the reference's pyrender scene geometry exactly (reference
render/render.py:28-106):

  * IntrinsicsCamera fx=fy=4754.97941935/2 (vocaset/FLAME topologies) or /8
    (BIWI), cx=cy=400, 800x800 viewport, znear 0.01 / zfar 3.0;
  * camera positioned at (0, 0, 1) looking down -z (the hard-coded pose at
    render.py:73-76);
  * optional Rodrigues pre-rotation of the mesh about `t_center`
    (render.py:41) and the `z_offset` camera shift (render.py:71);
  * five DirectionalLights of intensity 2.0 whose poses carry only
    translations (render.py:82-97) — pyrender directional lights ignore
    position, so all five shine along -z; together with the 0.2 ambient and
    the 0.3-gray metallic-roughness material the effective shade is
    ambient + diffuse * max(n.z, 0), two-sided because the reference renders
    with SKIP_CULL_FACES (render.py:99);
  * background white (default) or black (render.py:57-60).

The shading model approximates pyrender's PBR pipeline with a calibrated
Lambertian term — geometry (projection, pose, occlusion) is exact, pixel
values are approximate. Pure numpy; rendering is offline host tooling, not a
TPU workload (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

FOCAL_BASE = 4754.97941935
CAMERA_PARAMS = {
    # reference render/render.py:30-37
    "biwi": {"f": FOCAL_BASE / 8.0, "c": (400.0, 400.0)},
    "vocaset": {"f": FOCAL_BASE / 2.0, "c": (400.0, 400.0)},
    # MEAD renders FLAME meshes: same topology/scale as vocaset
    "mead": {"f": FOCAL_BASE / 2.0, "c": (400.0, 400.0)},
}
FRUSTUM = {"near": 0.01, "far": 3.0, "width": 800, "height": 800}
AMBIENT = 0.2          # scene ambient_light (render.py:57)
BASE_COLOR = 0.3       # material baseColorFactor (render.py:49)
METALLIC = 0.8         # metallicFactor (render.py:50)
ROUGHNESS = 0.8        # roughnessFactor (render.py:51)
LIGHT_INTENSITY = 2.0  # per light, five lights (render.py:45)


def rodrigues(rot: np.ndarray) -> np.ndarray:
    """Axis-angle (3,) -> rotation matrix (3, 3) (cv2.Rodrigues equivalent,
    used at reference render.py:41)."""
    rot = np.asarray(rot, np.float64)
    theta = float(np.linalg.norm(rot))
    if theta < 1e-12:
        return np.eye(3)
    k = rot / theta
    K = np.array([
        [0, -k[2], k[1]],
        [k[2], 0, -k[0]],
        [-k[1], k[0], 0],
    ])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted smooth vertex normals (V, 3) — what pyrender computes
    for `smooth=True` meshes (render.py:55)."""
    v = np.asarray(vertices, np.float64)
    fn = np.cross(
        v[faces[:, 1]] - v[faces[:, 0]], v[faces[:, 2]] - v[faces[:, 0]]
    )  # area-weighted (unnormalized cross product)
    vn = np.zeros_like(v)
    for j in range(3):
        np.add.at(vn, faces[:, j], fn)
    n = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(n, 1e-12)


def project_voca(
    vertices: np.ndarray,   # (V, 3) world coords
    dataset: str = "vocaset",
    size: int = 800,
    z_offset: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Perspective projection through the reference rig.

    Returns ((V, 2) float pixel xy, (V,) camera-space depth along -z)."""
    cam = CAMERA_PARAMS[dataset]
    scale = size / FRUSTUM["width"]   # intrinsics are defined for 800x800
    f = cam["f"] * scale
    cx, cy = cam["c"][0] * scale, cam["c"][1] * scale
    v = np.asarray(vertices, np.float64)
    rel = v - np.array([0.0, 0.0, 1.0 - z_offset])  # camera at (0,0,1-zoff)
    depth = -rel[:, 2]                              # looking down -z
    d = np.maximum(depth, 1e-9)
    u = cx + f * rel[:, 0] / d
    # +y (up) maps to smaller row indices (image y grows downward)
    w = cy - f * rel[:, 1] / d
    return np.stack([u, w], axis=1), depth


def shade_vertices(normals: np.ndarray) -> np.ndarray:
    """Per-vertex gray level: the reference's metallic-roughness material
    (base 0.3, metallic 0.8, roughness 0.8) under five intensity-2.0
    directional lights that all shine along -z (the camera direction), plus
    the 0.2 ambient. GLTF PBR with light == view == half-vector, two-sided
    because the reference renders with SKIP_CULL_FACES."""
    nz = np.abs(normals[:, 2])              # n.l = n.v = n.h here
    alpha = ROUGHNESS * ROUGHNESS
    alpha2 = alpha * alpha
    # GGX normal distribution at h = z
    d = alpha2 / (np.pi * (nz * nz * (alpha2 - 1.0) + 1.0) ** 2)
    # Smith-Schlick geometry term
    k = (ROUGHNESS + 1.0) ** 2 / 8.0
    g1 = nz / np.maximum(nz * (1.0 - k) + k, 1e-9)
    g = g1 * g1
    f0 = 0.04 * (1.0 - METALLIC) + BASE_COLOR * METALLIC
    spec = d * f0 * g / np.maximum(4.0 * nz * nz, 1e-6)
    c_diff = BASE_COLOR * (1.0 - METALLIC)
    radiance = (c_diff / np.pi + spec) * 5 * LIGHT_INTENSITY * nz
    return np.clip(BASE_COLOR * AMBIENT + radiance, 0.0, 1.0)


def render_frame_voca(
    vertices: np.ndarray,     # (V, 3)
    faces: np.ndarray,        # (F, 3) int
    dataset: str = "vocaset",
    size: int = 800,
    rot: Optional[np.ndarray] = None,
    t_center: Optional[np.ndarray] = None,
    z_offset: float = 0.0,
    background_black: bool = False,
) -> np.ndarray:
    """One (size, size, 3) uint8 frame: Gouraud-shaded z-buffered raster of
    the mesh through the VOCA rig."""
    v = np.asarray(vertices, np.float64)
    if rot is not None and np.any(np.asarray(rot) != 0):
        c = (
            np.zeros(3) if t_center is None
            else np.asarray(t_center, np.float64)
        )
        v = (rodrigues(rot) @ (v - c).T).T + c

    pix, depth = project_voca(v, dataset, size, z_offset)
    shade = shade_vertices(vertex_normals(v, faces))

    bg = 0.0 if background_black else 1.0
    img = np.full((size, size), bg, np.float32)
    zbuf = np.full((size, size), np.inf, np.float32)

    near, far = FRUSTUM["near"], FRUSTUM["far"]
    tri_pix = pix[faces]          # (F, 3, 2)
    tri_z = depth[faces]          # (F, 3)
    tri_shade = shade[faces]      # (F, 3)
    # frustum cull: all three verts inside [near, far]
    ok = ((tri_z > near) & (tri_z < far)).all(axis=1)
    # screen cull: bbox intersects the viewport
    mins = tri_pix.min(axis=1)
    maxs = tri_pix.max(axis=1)
    ok &= (maxs[:, 0] >= 0) & (mins[:, 0] < size)
    ok &= (maxs[:, 1] >= 0) & (mins[:, 1] < size)

    # hot loop: C++ rasterizer from the native runtime when built
    # (~100x the python loop at FLAME face counts), numpy fallback below
    from fdm_tpu.data.native import raster_gouraud

    if not raster_gouraud(tri_pix, tri_z, tri_shade, ok, size, img, zbuf):
        _raster_numpy(tri_pix, tri_z, tri_shade, ok, size, img, zbuf)

    gray = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    return np.stack([gray, gray, gray], axis=-1)


def _raster_numpy(tri_pix, tri_z, tri_shade, ok, size, img, zbuf) -> None:
    """Pure-numpy z-buffered barycentric fill (identical math to the C++
    fdm_raster_gouraud; used when native/libfdm_native.so isn't built)."""
    for i in np.nonzero(ok)[0]:
        p = tri_pix[i]
        x0 = max(int(np.floor(p[:, 0].min())), 0)
        x1 = min(int(np.ceil(p[:, 0].max())) + 1, size)
        y0 = max(int(np.floor(p[:, 1].min())), 0)
        y1 = min(int(np.ceil(p[:, 1].max())) + 1, size)
        if x0 >= x1 or y0 >= y1:
            continue
        # screen-space barycentric over the bbox grid
        ax, ay = p[0]
        bx, by = p[1]
        cx_, cy_ = p[2]
        den = (by - cy_) * (ax - cx_) + (cx_ - bx) * (ay - cy_)
        if abs(den) < 1e-12:
            continue
        gx = np.arange(x0, x1, dtype=np.float64)[None, :] + 0.5
        gy = np.arange(y0, y1, dtype=np.float64)[:, None] + 0.5
        w0 = ((by - cy_) * (gx - cx_) + (cx_ - bx) * (gy - cy_)) / den
        w1 = ((cy_ - ay) * (gx - cx_) + (ax - cx_) * (gy - cy_)) / den
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        z = w0 * tri_z[i, 0] + w1 * tri_z[i, 1] + w2 * tri_z[i, 2]
        sub_z = zbuf[y0:y1, x0:x1]
        upd = inside & (z < sub_z)
        if not upd.any():
            continue
        s = (
            w0 * tri_shade[i, 0] + w1 * tri_shade[i, 1]
            + w2 * tri_shade[i, 2]
        )
        sub_z[upd] = z[upd].astype(np.float32)
        img[y0:y1, x0:x1][upd] = s[upd].astype(np.float32)
