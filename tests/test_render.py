"""Software renderer: projection geometry, frame synthesis, video writing."""

import os

import numpy as np

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
