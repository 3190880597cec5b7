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
    position, so all five shine along -z; the 0.2 scene ambient and the
    0.3-gray metallic-roughness material feed the glTF-PBR BRDF below;
    SKIP_CULL_FACES (render.py:99) rasterizes back faces too (visible only
    through cavities), which shade near-ambient under the unflipped-normal
    Khronos math;
  * background white (default) or black (render.py:57-60).

Shading evaluates the same glTF 2.0 metallic-roughness BRDF as pyrender's
`mesh.frag` (a port of the Khronos glTF-WebGL-PBR reference shader) term by
term — Schlick Fresnel with reflectance90, Smith occlusion, GGX
distribution, (1-F)*c_diff/pi diffuse, per-light NdotL weighting, final
1/2.2 gamma on mesh fragments only. The default `shading="fragment"` path
does it exactly the way the GL pipeline does: normals and world positions
are interpolated across each triangle with PERSPECTIVE-CORRECT barycentrics
(GL `smooth` varyings), renormalized per pixel, and the BRDF is evaluated
per fragment; depth tests interpolate 1/z (window-space ordering).
`shading="gouraud"` keeps the cheaper per-vertex evaluation. In-image
validation against a GL golden frame remains impossible (no OSMesa; see
PARITY.md). Pure numpy + the optional C++ fill loops; rendering is offline
host tooling, not a TPU workload (SURVEY.md §2.4).
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


def shade_vertices(
    normals: np.ndarray,
    vertices: Optional[np.ndarray] = None,
    cam_pos: Tuple[float, float, float] = (0.0, 0.0, 1.0),
) -> np.ndarray:
    """Per-vertex LINEAR gray radiance: the glTF 2.0 metallic-roughness BRDF
    exactly as pyrender's mesh.frag evaluates it (pyrender's shader is a
    port of the Khronos glTF-WebGL-PBR reference implementation), for the
    reference scene (render/render.py:45-97): material base 0.3, metallic
    0.8, roughness 0.8; five white directional lights of intensity 2.0 whose
    poses carry identity rotations, so every light shines along -z; scene
    ambient 0.2.

    Matches the shader term by term: Schlick Fresnel between F0 =
    mix(0.04, base, metallic) and reflectance90 = clamp(25*F0, 0, 1); the
    Smith geometric-occlusion form 2x/(x + sqrt(r^2 + (1-r^2)x^2)) with
    r = alphaRoughness = roughness^2; Trowbridge-Reitz/GGX distribution with
    alphaRoughness^2; diffuse (1-F) * c_diff/pi with c_diff =
    base*(1-0.04)*(1-metallic); NdotL/NdotV clamped to [1e-3, 1] with the
    shader's abs() applied to NdotV ONLY — the normal is NOT flipped for
    back-facing surfaces, so a back face shades near-ambient (its NdotL
    sits at the 1e-3 floor). SKIP_CULL_FACES means pyrender rasterizes
    those back faces at all (they are only visible through cavities of a
    closed mesh); whether its shader additionally inverts the normal there
    (the glTF double-sided rule) cannot be validated in-image, so we keep
    the plain Khronos-reference math. Per-light contribution is
    NdotL * intensity * (diffuse + spec).

    The view vector is the true per-vertex direction to the camera (not the
    -z approximation). This per-VERTEX evaluation feeds the Gouraud path;
    the default per-fragment path instead interpolates normals/positions
    and evaluates the same BRDF per pixel (see module docstring). Returns
    LINEAR radiance — the shader's final pow(color, 1/2.2) gamma is applied
    per covered pixel by render_frame_voca, as pyrender applies it to mesh
    fragments but not to the glClearColor background."""
    n = np.asarray(normals, np.float64)
    if vertices is None:
        v_dir = np.tile(np.array([0.0, 0.0, 1.0]), (n.shape[0], 1))
    else:
        v_dir = np.asarray(cam_pos, np.float64) - np.asarray(
            vertices, np.float64
        )
        v_dir /= np.maximum(
            np.linalg.norm(v_dir, axis=1, keepdims=True), 1e-12
        )
    return _brdf_gray(n, v_dir)


def _shading_constants() -> Tuple[float, float, float, float, float, float]:
    """(f0, reflectance90, alphaRoughness, c_diff, light_sum, ambient) for
    the reference scene's material/lights."""
    f0 = 0.04 * (1.0 - METALLIC) + BASE_COLOR * METALLIC
    refl90 = min(f0 * 25.0, 1.0)
    a_r = ROUGHNESS * ROUGHNESS        # alphaRoughness
    c_diff = BASE_COLOR * (1.0 - 0.04) * (1.0 - METALLIC)
    return (f0, refl90, a_r, c_diff, 5.0 * LIGHT_INTENSITY,
            BASE_COLOR * AMBIENT)


# the scene's material/lights are module constants, so these are too
# (_brdf_gray runs once per rasterized triangle in the numpy fallback)
_SHADING_CONSTANTS = _shading_constants()
_L_DIR = np.array([0.0, 0.0, 1.0])


def _brdf_gray(n: np.ndarray, v_dir: np.ndarray) -> np.ndarray:
    """Khronos glTF-WebGL-PBR gray radiance for unit normals/view dirs
    (..., 3) under the reference scene's five -z directional lights +
    ambient. Shared by the per-vertex (Gouraud) and per-fragment paths —
    the latter evaluates it at interpolated, renormalized fragments."""
    f0, refl90, a_r, c_diff, light_sum, ambient = _SHADING_CONSTANTS
    # all five lights shine along -z -> surface-to-light vector is +z
    h = v_dir + _L_DIR
    h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    # abs() on NdotV only (the shader's sole two-sidedness concession);
    # the normal itself stays unflipped, so back faces bottom out at the
    # 1e-3 NdotL floor and shade near-ambient
    ndl = np.clip(n[..., 2], 1e-3, 1.0)
    ndv = np.clip(np.abs(np.sum(n * v_dir, axis=-1)), 1e-3, 1.0)
    ndh = np.clip(np.sum(n * h, axis=-1), 0.0, 1.0)
    vdh = np.clip(np.sum(v_dir * h, axis=-1), 0.0, 1.0)

    fres = f0 + (refl90 - f0) * (1.0 - vdh) ** 5
    r2 = a_r * a_r
    att_l = 2.0 * ndl / (ndl + np.sqrt(r2 + (1.0 - r2) * ndl * ndl))
    att_v = 2.0 * ndv / (ndv + np.sqrt(r2 + (1.0 - r2) * ndv * ndv))
    geo = att_l * att_v
    fd = (ndh * r2 - ndh) * ndh + 1.0
    dist = r2 / (np.pi * fd * fd)
    diffuse = (1.0 - fres) * c_diff / np.pi
    spec = fres * geo * dist / (4.0 * ndl * ndv)
    radiance = ndl * light_sum * (diffuse + spec)
    return np.clip(ambient + radiance, 0.0, 1.0)


def render_frame_voca(
    vertices: np.ndarray,     # (V, 3)
    faces: np.ndarray,        # (F, 3) int
    dataset: str = "vocaset",
    size: int = 800,
    rot: Optional[np.ndarray] = None,
    t_center: Optional[np.ndarray] = None,
    z_offset: float = 0.0,
    background_black: bool = False,
    shading: str = "fragment",
) -> np.ndarray:
    """One (size, size, 3) uint8 frame: z-buffered raster of the mesh
    through the VOCA rig. `shading="fragment"` (default) interpolates
    normals/positions perspective-correct and evaluates the glTF-PBR BRDF
    per pixel (pyrender's pipeline); `"gouraud"` interpolates the
    per-vertex BRDF result (cheaper, visually close)."""
    if shading not in ("fragment", "gouraud"):
        raise ValueError(f"unknown shading mode: {shading!r}")
    v = np.asarray(vertices, np.float64)
    if rot is not None and np.any(np.asarray(rot) != 0):
        c = (
            np.zeros(3) if t_center is None
            else np.asarray(t_center, np.float64)
        )
        v = (rodrigues(rot) @ (v - c).T).T + c

    cam_pos = (0.0, 0.0, 1.0 - z_offset)
    pix, depth = project_voca(v, dataset, size, z_offset)
    normals = vertex_normals(v, faces)

    bg = 0.0 if background_black else 1.0
    img = np.full((size, size), bg, np.float32)
    zbuf = np.full((size, size), np.inf, np.float32)

    near, far = FRUSTUM["near"], FRUSTUM["far"]
    tri_pix = pix[faces]          # (F, 3, 2)
    tri_z = depth[faces]          # (F, 3)
    # frustum cull: all three verts inside [near, far]
    ok = ((tri_z > near) & (tri_z < far)).all(axis=1)
    # screen cull: bbox intersects the viewport
    mins = tri_pix.min(axis=1)
    maxs = tri_pix.max(axis=1)
    ok &= (maxs[:, 0] >= 0) & (mins[:, 0] < size)
    ok &= (maxs[:, 1] >= 0) & (mins[:, 1] < size)

    # hot loop: C++ rasterizer from the native runtime when built
    # (~100x the python loop at FLAME face counts), numpy fallback below
    from fdm_tpu.data.native import raster_gouraud, raster_pbr

    if shading == "fragment":
        tri_nrm = normals[faces]  # (F, 3, 3)
        tri_pos = v[faces]        # (F, 3, 3)
        params = np.array(
            list(cam_pos) + list(_SHADING_CONSTANTS), np.float32
        )
        if not raster_pbr(tri_pix, tri_z, tri_nrm, tri_pos, ok, size,
                          params, img, zbuf):
            _raster_pbr_numpy(tri_pix, tri_z, tri_nrm, tri_pos, ok, size,
                              cam_pos, img, zbuf)
    else:
        shade = shade_vertices(normals, v, cam_pos=cam_pos)
        tri_shade = shade[faces]  # (F, 3)
        if not raster_gouraud(tri_pix, tri_z, tri_shade, ok, size, img,
                              zbuf):
            _raster_numpy(tri_pix, tri_z, tri_shade, ok, size, img, zbuf)

    # pyrender's mesh.frag gamma-corrects mesh fragments (pow(color, 1/2.2))
    # but the background comes from glClearColor and stays un-gammaed
    covered = np.isfinite(zbuf)
    img[covered] = np.power(np.clip(img[covered], 0.0, 1.0), 1.0 / 2.2)
    gray = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    return np.stack([gray, gray, gray], axis=-1)


def _tri_coverage(p: np.ndarray, size: int):
    """Shared raster-coverage rule for the numpy fills (one place, so the
    gouraud and fragment paths can never desynchronize): clamped bbox +
    screen-space barycentrics at pixel centers. Returns
    (x0, x1, y0, y1, w0, w1, w2, inside) or None when the triangle is
    degenerate or misses the viewport."""
    x0 = max(int(np.floor(p[:, 0].min())), 0)
    x1 = min(int(np.ceil(p[:, 0].max())) + 1, size)
    y0 = max(int(np.floor(p[:, 1].min())), 0)
    y1 = min(int(np.ceil(p[:, 1].max())) + 1, size)
    if x0 >= x1 or y0 >= y1:
        return None
    ax, ay = p[0]
    bx, by = p[1]
    cx_, cy_ = p[2]
    den = (by - cy_) * (ax - cx_) + (cx_ - bx) * (ay - cy_)
    if abs(den) < 1e-12:
        return None
    gx = np.arange(x0, x1, dtype=np.float64)[None, :] + 0.5
    gy = np.arange(y0, y1, dtype=np.float64)[:, None] + 0.5
    w0 = ((by - cy_) * (gx - cx_) + (cx_ - bx) * (gy - cy_)) / den
    w1 = ((cy_ - ay) * (gx - cx_) + (ax - cx_) * (gy - cy_)) / den
    w2 = 1.0 - w0 - w1
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    if not inside.any():
        return None
    return x0, x1, y0, y1, w0, w1, w2, inside


def _raster_pbr_numpy(tri_pix, tri_z, tri_nrm, tri_pos, ok, size, cam_pos,
                      img, zbuf) -> None:
    """Pure-numpy per-fragment glTF-PBR fill (identical math to the C++
    fdm_raster_pbr; used when native/libfdm_native.so isn't built or is
    stale): perspective-correct barycentric interpolation of normals and
    world positions, per-pixel renormalization and BRDF, 1/z depth."""
    cam = np.asarray(cam_pos, np.float64)
    for i in np.nonzero(ok)[0]:
        cov = _tri_coverage(tri_pix[i], size)
        if cov is None:
            continue
        x0, x1, y0, y1, w0, w1, w2, inside = cov
        # perspective-correct weights wi/zi; depth = 1 / sum (GL ordering).
        # inv mixes signs outside the triangle, so divide only where inside
        pw0 = w0 / tri_z[i, 0]
        pw1 = w1 / tri_z[i, 1]
        pw2 = w2 / tri_z[i, 2]
        inv = pw0 + pw1 + pw2
        z = np.full_like(inv, np.inf)
        z[inside] = 1.0 / inv[inside]
        sub_z = zbuf[y0:y1, x0:x1]
        upd = z < sub_z
        if not upd.any():
            continue
        b = np.stack([pw0[upd], pw1[upd], pw2[upd]], axis=-1) / inv[upd][
            :, None
        ]
        n = b @ tri_nrm[i]
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        v_dir = cam - b @ tri_pos[i]
        v_dir /= np.maximum(
            np.linalg.norm(v_dir, axis=-1, keepdims=True), 1e-12
        )
        sub_z[upd] = z[upd].astype(np.float32)
        img[y0:y1, x0:x1][upd] = _brdf_gray(n, v_dir).astype(np.float32)


def _raster_numpy(tri_pix, tri_z, tri_shade, ok, size, img, zbuf) -> None:
    """Pure-numpy z-buffered barycentric fill (identical math to the C++
    fdm_raster_gouraud; used when native/libfdm_native.so isn't built)."""
    for i in np.nonzero(ok)[0]:
        cov = _tri_coverage(tri_pix[i], size)
        if cov is None:
            continue
        x0, x1, y0, y1, w0, w1, w2, inside = cov
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
