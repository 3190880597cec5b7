"""Software renderer: projection geometry, frame synthesis, video writing."""

import os

import numpy as np
import pytest

from fdm_tpu.render import (
    project_orthographic,
    render_frame,
    render_sequence,
    write_video,
)

rng = np.random.RandomState(0)


def test_projection_in_bounds_and_depth_normalized():
    verts = rng.randn(50, 3).astype(np.float32)
    xy, z = project_orthographic(verts, size=64)
    assert xy.shape == (50, 2) and z.shape == (50,)
    assert xy.min() >= 0 and xy.max() < 64
    assert z.min() >= 0.0 and z.max() <= 1.0


def test_projection_fixed_bounds_is_stable():
    verts = rng.randn(20, 3).astype(np.float32)
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    xy1, _ = project_orthographic(verts, 64, bounds=(lo, hi))
    # same bounds, shifted subset -> same pixels for shared vertices
    xy2, _ = project_orthographic(verts[:10], 64, bounds=(lo, hi))
    np.testing.assert_array_equal(xy1[:10], xy2)


def test_render_frame_shape_and_content():
    verts = rng.randn(100, 3).astype(np.float32)
    frame = render_frame(verts, size=64)
    assert frame.shape == (64, 64, 3) and frame.dtype == np.uint8
    assert frame.max() > 0  # something was drawn


def test_render_sequence_and_write_video(tmp_path):
    seq = rng.randn(1, 30, 3).astype(np.float32) + rng.randn(5, 30, 3) * 0.01
    frames = list(render_sequence(seq, size=64))
    assert len(frames) == 5
    path = str(tmp_path / "out.mp4")
    n = write_video(iter(frames), path, fps=25)
    assert n == 5
    assert os.path.getsize(path) > 0


def test_render_sequence_accepts_flat_vertices():
    seq = rng.randn(3, 90).astype(np.float32)  # (T, V*3)
    frames = list(render_sequence(seq, size=32))
    assert frames[0].shape == (32, 32, 3)


def test_render_mesh_frame_with_faces(tmp_path):
    from fdm_tpu.render import render_mesh_frame

    verts = rng.randn(20, 3).astype(np.float32)
    faces = np.stack(
        [np.arange(18), np.arange(1, 19), np.arange(2, 20)], axis=1
    )
    frame = render_mesh_frame(verts, faces, size=64)
    assert frame.shape == (64, 64, 3) and frame.dtype == np.uint8
    assert frame.max() > 0


def test_render_cli_with_faces(tmp_path):
    from fdm_tpu.cli import render as render_cli

    seq = rng.randn(1, 12, 3).astype(np.float32) + rng.randn(3, 12, 3) * 0.01
    np.save(str(tmp_path / "seq.npy"), seq)
    faces = np.stack([np.arange(10), np.arange(1, 11), np.arange(2, 12)], 1)
    np.save(str(tmp_path / "faces.npy"), faces)
    assert render_cli.main(
        ["--pred_path", str(tmp_path / "seq.npy"),
         "--output_dir", str(tmp_path / "v"), "--size", "48",
         "--faces", str(tmp_path / "faces.npy")]
    ) == 0
    import os
    assert os.path.getsize(str(tmp_path / "v" / "seq.mp4")) > 0


# ---------------- VOCA rig (reference render/render.py:28-106) ----------


def _uv_sphere(radius=0.08, center=(0.0, 0.0, 0.0), n_lat=24, n_lon=32):
    """Face-scale sphere mesh for rig tests."""
    lats = np.linspace(0, np.pi, n_lat)
    lons = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    verts = []
    for th in lats:
        for ph in lons:
            verts.append([
                np.sin(th) * np.cos(ph), np.cos(th), np.sin(th) * np.sin(ph)
            ])
    v = np.asarray(verts) * radius + np.asarray(center)
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    return v.astype(np.float64), np.asarray(faces, np.int64)


def test_project_voca_matches_reference_pinhole():
    """Camera matrix parity: camera at (0,0,1) looking -z, fx=fy=4754.98/2
    (vocaset) or /8 (biwi), cx=cy=400."""
    from fdm_tpu.render import project_voca

    pts = np.array([
        [0.0, 0.0, 0.0],     # optical axis -> principal point, depth 1
        [0.1, 0.0, 0.0],
        [0.0, 0.1, 0.0],
        [0.0, 0.0, 0.5],     # closer to the camera -> depth 0.5
    ])
    pix, depth = project_voca(pts, "vocaset")
    f = 4754.97941935 / 2
    np.testing.assert_allclose(pix[0], [400.0, 400.0], atol=1e-9)
    np.testing.assert_allclose(depth, [1.0, 1.0, 1.0, 0.5], atol=1e-12)
    np.testing.assert_allclose(pix[1], [400.0 + f * 0.1, 400.0], atol=1e-9)
    # +y is up -> smaller row index
    np.testing.assert_allclose(pix[2], [400.0, 400.0 - f * 0.1], atol=1e-9)
    # perspective: closer point subtends a larger angle
    pix_b, _ = project_voca(pts, "biwi")
    np.testing.assert_allclose(
        pix_b[1, 0] - 400.0, (f / 4) * 0.1, atol=1e-9
    )


def test_shade_vertices_matches_gltf_pbr_oracle():
    """Pin the shading to the Khronos glTF-WebGL-PBR BRDF pyrender's
    mesh.frag ports: at n = v = l = h = +z every term is analytic.
    Hand-computed here with independent arithmetic (reference scene
    constants: base 0.3, metallic 0.8, roughness 0.8, five lights of
    intensity 2.0, ambient 0.2; reference render/render.py:45-97)."""
    from fdm_tpu.render.voca_rig import shade_vertices

    # head-on: fresnel collapses to F0, geo to 1, D to 1/(pi*aR^2)
    f0 = 0.04 * 0.2 + 0.3 * 0.8                    # mix(0.04, base, metal)
    a_r = 0.8 * 0.8                                # alphaRoughness
    # GGX at NdotH=1: f = NdotH^2*(aR^2-1)+1 = aR^2, so
    # D = aR^2/(pi*f^2) = 1/(pi*aR^2)
    dist = 1.0 / (np.pi * a_r * a_r)
    c_diff = 0.3 * (1.0 - 0.04) * (1.0 - 0.8)
    expected = 0.3 * 0.2 + 1.0 * 5 * 2.0 * (
        (1.0 - f0) * c_diff / np.pi + f0 * 1.0 * dist / 4.0
    )

    normals = np.array([[0.0, 0.0, 1.0]])
    got = shade_vertices(normals, vertices=np.array([[0.0, 0.0, 0.0]]),
                         cam_pos=(0.0, 0.0, 1.0))
    np.testing.assert_allclose(got[0], expected, rtol=1e-12)

    # back-facing surface (unflipped Khronos math): NdotL bottoms out at
    # the 1e-3 floor, so the shade collapses to near the 0.06 ambient —
    # NOT to the front-face value (the shader's abs() is on NdotV only)
    got_flip = shade_vertices(-normals, vertices=np.array([[0.0, 0.0, 0.0]]),
                              cam_pos=(0.0, 0.0, 1.0))
    assert got_flip[0] < 0.1 * got[0] + 0.06 + 1e-6
    assert got_flip[0] >= 0.3 * 0.2  # ambient floor preserved

    # grazing normals keep the NdotL floor (1e-3) rather than going black,
    # and stay strictly below the head-on value
    grazing = shade_vertices(np.array([[1.0, 0.0, 0.0]]),
                             vertices=np.array([[0.0, 0.0, 0.0]]),
                             cam_pos=(0.0, 0.0, 1.0))
    assert 0.3 * 0.2 < grazing[0] < got[0]


def test_render_frame_gamma_on_mesh_only():
    """pyrender gamma-corrects mesh fragments (pow 1/2.2) but not the
    glClearColor background — covered pixels must be brighter than the
    linear shade, background exactly 255/0."""
    from fdm_tpu.render.voca_rig import render_frame_voca, shade_vertices

    v, f = _uv_sphere(radius=0.08)
    size = 120
    img = render_frame_voca(v, f, dataset="vocaset", size=size)
    gray = img[..., 0].astype(np.float64) / 255.0
    center = gray[size // 2, size // 2]
    # the sphere's nearest point has normal ~ +z: linear shade ^ (1/2.2)
    head_on = shade_vertices(
        np.array([[0.0, 0.0, 1.0]]), np.array([[0.0, 0.0, 0.08]])
    )[0]
    np.testing.assert_allclose(center, head_on ** (1 / 2.2), atol=0.02)
    assert img[0, 0, 0] == 255  # background untouched by gamma


_GOLDEN_KWARGS = dict(
    dataset="vocaset", size=128, rot=np.array([0.0, 0.4, 0.15]),
    t_center=np.zeros(3), z_offset=0.02, background_black=True,
)


def test_voca_render_matches_checked_in_golden_gouraud(monkeypatch):
    """Regression pin for the FULL Gouraud render path (projection,
    rotation, z_offset, PBR shading, gamma, black background): byte-exact
    against a checked-in frame on the numpy raster; the C++ raster may
    differ only on shared-edge pixels (f32 vs f64 edge rounding, bounded
    fraction)."""
    import fdm_tpu.data.native as native_mod
    from fdm_tpu.data.native import native_available
    from fdm_tpu.render.voca_rig import render_frame_voca

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "data",
                     "golden_voca_sphere_128.npy")
    )
    v, f = _uv_sphere(radius=0.08)
    kwargs = dict(_GOLDEN_KWARGS, shading="gouraud")

    with monkeypatch.context() as m:
        m.setattr(native_mod, "raster_gouraud", lambda *a, **k: False)
        img_np = render_frame_voca(v, f, **kwargs)
    np.testing.assert_array_equal(img_np[..., 0], golden)

    if native_available():
        img_c = render_frame_voca(v, f, **kwargs)[..., 0].astype(int)
        diff = np.abs(img_c - golden.astype(int))
        assert (diff > 2).mean() < 0.005, (diff > 2).mean()


def test_voca_render_matches_checked_in_golden_fragment(monkeypatch):
    """Same regression pin for the default per-fragment path (perspective-
    correct interpolation + per-pixel BRDF, pyrender's pipeline)."""
    import fdm_tpu.data.native as native_mod
    from fdm_tpu.data.native import native_available
    from fdm_tpu.render.voca_rig import render_frame_voca

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "data",
                     "golden_voca_sphere_128_pbr.npy")
    )
    v, f = _uv_sphere(radius=0.08)

    with monkeypatch.context() as m:
        m.setattr(native_mod, "raster_pbr", lambda *a, **k: False)
        img_np = render_frame_voca(v, f, **_GOLDEN_KWARGS)
    np.testing.assert_array_equal(img_np[..., 0], golden)

    if native_available():
        img_c = render_frame_voca(v, f, **_GOLDEN_KWARGS)[..., 0].astype(int)
        diff = np.abs(img_c - golden.astype(int))
        assert (diff > 2).mean() < 0.005, (diff > 2).mean()


def test_fragment_shading_interpolates_normals_not_radiance():
    """Per-fragment vs Gouraud on a COARSE sphere: inside a triangle the
    fragment path renormalizes the interpolated normal (pulling it toward
    the sphere's true curvature) while Gouraud linearly blends the vertex
    radiance. Both agree at the vertices; the interiors must differ, and
    the fragment image of a coarse mesh must sit closer to a dense mesh's
    image than the Gouraud one does (normal interpolation recovers
    curvature that radiance interpolation cannot)."""
    from fdm_tpu.render.voca_rig import render_frame_voca

    size = 160
    v_c, f_c = _uv_sphere(radius=0.08, n_lat=8, n_lon=10)   # coarse
    v_d, f_d = _uv_sphere(radius=0.08, n_lat=64, n_lon=96)  # dense
    frag = render_frame_voca(v_c, f_c, size=size).astype(float)
    gour = render_frame_voca(
        v_c, f_c, size=size, shading="gouraud"
    ).astype(float)
    dense = render_frame_voca(v_d, f_d, size=size).astype(float)

    assert np.abs(frag - gour).max() > 2  # interiors genuinely differ
    # compare only where the coarse renders agree on coverage
    cover = (frag[..., 0] != 255) & (gour[..., 0] != 255) \
        & (dense[..., 0] != 255)
    err_frag = np.abs(frag[..., 0] - dense[..., 0])[cover].mean()
    err_gour = np.abs(gour[..., 0] - dense[..., 0])[cover].mean()
    assert err_frag < err_gour, (err_frag, err_gour)


def test_fragment_raster_depth_is_perspective_correct():
    """The per-fragment z-buffer interpolates 1/z linearly in screen space
    (GL window-space ordering), NOT camera z: at the midpoint pixel of an
    edge spanning depths (z0, z1) the stored depth must be the harmonic
    mean 2/(1/z0 + 1/z1), not the arithmetic mean."""
    from fdm_tpu.render.voca_rig import _raster_pbr_numpy

    size = 64
    z0, z1 = 0.5, 1.5
    tri_pix = np.array(
        [[[0.5, 0.5], [0.5, 62.5], [62.5, 31.5]]], np.float64
    )
    tri_z = np.array([[z0, z0, z1]], np.float64)
    tri_nrm = np.tile(np.array([0.0, 0.0, 1.0]), (1, 3, 1))
    tri_pos = np.zeros((1, 3, 3))
    img = np.full((size, size), 1.0, np.float32)
    zbuf = np.full((size, size), np.inf, np.float32)
    _raster_pbr_numpy(tri_pix, tri_z, tri_nrm, tri_pos,
                      np.array([1], np.uint8), size, (0.0, 0.0, 1.0),
                      img, zbuf)
    # pixel halfway along the bottom edge (vertex 0 -> vertex 2):
    # screen-space w = (1/2, 0, 1/2)
    y = int((0.5 + 31.5) / 2)
    mid = zbuf[y - 1:y + 2, 31]
    harmonic = 2.0 / (1.0 / z0 + 1.0 / z1)
    arithmetic = (z0 + z1) / 2.0
    got = mid[np.isfinite(mid)]
    assert got.size > 0
    assert np.all(np.abs(got - harmonic) < 0.05), (got, harmonic)
    assert np.all(np.abs(got - arithmetic) > 0.2)


def test_voca_rodrigues_matches_scipy():
    from scipy.spatial.transform import Rotation

    from fdm_tpu.render.voca_rig import rodrigues

    for vec in ([0.3, -0.2, 0.5], [0, 0, 0], [np.pi / 2, 0, 0]):
        np.testing.assert_allclose(
            rodrigues(np.asarray(vec)),
            Rotation.from_rotvec(vec).as_matrix(), atol=1e-10,
        )


def test_vertex_normals_are_radial_on_sphere():
    from fdm_tpu.render import vertex_normals

    v, f = _uv_sphere()
    n = vertex_normals(v, f)
    radial = v - v.mean(axis=0)
    radial /= np.linalg.norm(radial, axis=1, keepdims=True)
    # poles are degenerate in a UV sphere; check the midband
    band = np.abs(radial[:, 1]) < 0.8
    dots = np.sum(n[band] * radial[band], axis=1)
    assert dots.min() > 0.97


def test_voca_render_is_lit_smooth_shaded_and_nondegenerate():
    from fdm_tpu.render.voca_rig import render_frame_voca

    v, f = _uv_sphere(radius=0.08)
    size = 200
    img = render_frame_voca(v, f, dataset="vocaset", size=size)
    gray = img[..., 0].astype(np.float64)

    # non-degenerate: background white at corners, object covers the center
    assert gray[0, 0] == 255 and gray[-1, -1] == 255
    center = gray[size // 2, size // 2]
    assert center < 250  # lit surface, not background

    # lit by the -z light: the sphere's nearest point (center) is brighter
    # than its silhouette edge
    row = gray[size // 2]
    obj = np.nonzero(row < 250)[0]
    assert len(obj) > 20
    edge = row[obj[2]]
    assert center > edge + 30

    # smooth (Gouraud) shading: many distinct gray levels along the scanline,
    # flat shading would quantize to a handful of per-face constants
    assert len(np.unique(row[obj])) > 25

    # occlusion: black background mode flips the empty corners only
    img_b = render_frame_voca(
        v, f, dataset="vocaset", size=size, background_black=True
    )
    assert img_b[0, 0, 0] == 0
    np.testing.assert_array_equal(img_b[size // 2, size // 2], img[size // 2, size // 2])


def test_voca_render_rotation_moves_silhouette():
    from fdm_tpu.render.voca_rig import render_frame_voca

    # off-center bump (ellipsoid) so a y-rotation changes the image
    v, f = _uv_sphere(radius=0.06, center=(0.03, 0.0, 0.0))
    size = 160
    a = render_frame_voca(v, f, size=size)
    b = render_frame_voca(
        v, f, size=size, rot=np.array([0.0, np.pi / 4, 0.0]),
        t_center=np.zeros(3),
    )
    assert np.abs(a.astype(int) - b.astype(int)).max() > 50


def test_render_cli_voca_rig_shading_modes(tmp_path):
    """--shading threads through the CLI to the voca rig; both modes write
    valid videos and the frames genuinely differ."""
    from fdm_tpu.cli import render as render_cli

    v, f = _uv_sphere(radius=0.07, n_lat=10, n_lon=12)
    np.save(str(tmp_path / "seq.npy"), np.stack([v, v]))
    np.save(str(tmp_path / "faces.npy"), f)
    outs = {}
    for mode in ("fragment", "gouraud"):
        assert render_cli.main(
            ["--pred_path", str(tmp_path / "seq.npy"),
             "--output_dir", str(tmp_path / mode), "--size", "96",
             "--faces", str(tmp_path / "faces.npy"), "--rig", "voca",
             "--shading", mode]
        ) == 0
        outs[mode] = os.path.getsize(str(tmp_path / mode / "seq.mp4"))
    assert min(outs.values()) > 0


def test_render_sequence_voca_rig_and_video(tmp_path):
    from fdm_tpu.render import render_sequence, write_video

    v, f = _uv_sphere(radius=0.07, n_lat=12, n_lon=16)
    seq = np.stack([v, v + np.array([0.0, 0.005, 0.0])])
    frames = list(render_sequence(seq, size=120, faces=f, rig="voca"))
    assert len(frames) == 2 and frames[0].shape == (120, 120, 3)
    out = str(tmp_path / "voca.mp4")
    n = write_video(iter(frames), out, fps=25)
    assert n == 2 and os.path.getsize(out) > 0


def _riff_chunks(buf, start, end):
    """Yield (fourcc, payload_start, payload_size) inside buf[start:end]."""
    import struct
    pos = start
    while pos + 8 <= end:
        cc = buf[pos:pos + 4]
        (sz,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        yield cc, pos + 8, sz
        pos += 8 + sz + (sz % 2)


def test_avi_mjpeg_audio_mux_roundtrip(tmp_path):
    """render/avi.py writes a playable MJPEG+PCM AVI without ffmpeg: cv2
    reads the video stream back, and the interleaved '01wb' chunks carry
    the exact PCM the caller supplied (the reference's final artifact is a
    video WITH audio — render/render.py:146-153 muxes via ffmpeg, which
    this image does not have)."""
    import struct
    import cv2
    from fdm_tpu.render.avi import encode_jpeg_frames, write_avi_mjpeg

    rng = np.random.RandomState(0)
    n, w, h, fps, sr = 10, 64, 48, 25, 16000
    frames = [
        (rng.rand(h, w, 3) * 255).astype(np.uint8) for _ in range(n)
    ]
    t = np.arange(int(sr * n / fps) + 37)  # +tail samples ride last chunk
    audio = (0.5 * np.sin(2 * np.pi * 440.0 * t / sr)).astype(np.float32)
    path = str(tmp_path / "clip.avi")
    jpegs = encode_jpeg_frames(frames)
    assert write_avi_mjpeg(path, jpegs, fps, (w, h),
                           audio=audio, sample_rate=sr) == n

    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    count = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (h, w, 3)
        count += 1
    assert count == n
    assert abs(cap.get(cv2.CAP_PROP_FPS) - fps) < 0.5
    cap.release()

    buf = open(path, "rb").read()
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    # walk the top-level chunks to the movi list; collect audio payloads
    pcm = b""
    saw_idx = saw_auds = False
    for cc, ps, sz in _riff_chunks(buf, 12, len(buf)):
        if cc == b"idx1":
            saw_idx = True
        if cc != b"LIST":
            continue
        kind = buf[ps:ps + 4]
        if kind == b"movi":
            for c2, p2, s2 in _riff_chunks(buf, ps + 4, ps + sz):
                if c2 == b"01wb":
                    pcm += buf[p2:p2 + s2]
        elif kind == b"hdrl":
            saw_auds = b"auds" in buf[ps:ps + sz]
    assert saw_idx and saw_auds
    expect = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    got = np.frombuffer(pcm, np.int16)
    np.testing.assert_array_equal(got, expect)


def test_write_video_audio_fallback_writes_avi(tmp_path, monkeypatch):
    """With an audio_path and no ffmpeg binary, write_video produces the
    muxed .avi next to the silent .mp4 instead of dropping the audio."""
    import shutil as _shutil
    from scipy.io import wavfile
    from fdm_tpu.render.renderer import write_video

    monkeypatch.setattr(_shutil, "which", lambda name: None)
    sr = 16000
    wav_path = str(tmp_path / "a.wav")
    wavfile.write(
        wav_path, sr,
        (np.sin(np.arange(sr) * 0.05) * 20000).astype(np.int16),
    )
    frames = [np.full((32, 32, 3), i * 20, np.uint8) for i in range(5)]
    out = str(tmp_path / "clip.mp4")
    assert write_video(iter(frames), out, fps=25, audio_path=wav_path) == 5
    avi = str(tmp_path / "clip.avi")
    assert os.path.exists(out) and os.path.exists(avi)
    buf = open(avi, "rb").read()
    assert buf[:4] == b"RIFF" and b"01wb" in buf and b"MJPG" in buf


@pytest.mark.parametrize("w,h,n,audio_len", [
    (33, 17, 1, 0),        # odd dims, single frame, no audio
    (64, 48, 3, 100),      # audio much shorter than one frame span
    (31, 31, 7, 16000),    # odd square, audio longer than the video
])
def test_avi_writer_edge_shapes(tmp_path, w, h, n, audio_len):
    """Odd dimensions, single frames, and degenerate audio lengths must
    still produce a cv2-readable AVI with the right frame count."""
    import cv2
    from fdm_tpu.render.avi import encode_jpeg_frames, write_avi_mjpeg

    rng = np.random.RandomState(0)
    frames = [(rng.rand(h, w, 3) * 255).astype(np.uint8) for _ in range(n)]
    audio = (
        (np.sin(np.arange(audio_len) * 0.1) * 0.5).astype(np.float32)
        if audio_len else None
    )
    path = str(tmp_path / "edge.avi")
    assert write_avi_mjpeg(
        path, encode_jpeg_frames(frames), 25, (w, h), audio=audio
    ) == n
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    count = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (h, w, 3)
        count += 1
    assert count == n
    cap.release()
