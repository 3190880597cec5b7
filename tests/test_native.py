"""Native C++ data runtime: npy/wav decode parity vs numpy/scipy, and the
threaded prefetch ring. Builds the library on demand (skips without g++)."""

import os

import numpy as np
import pytest

from fdm_tpu.data import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.build_native():
        pytest.skip("g++/make unavailable; native runtime not built")


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.float16,
                                   np.int16, np.int32, np.int64])
def test_read_npy_dtype_parity(tmp_path, dtype):
    rng = np.random.RandomState(0)
    if np.issubdtype(dtype, np.floating):
        arr = rng.randn(7, 5, 3).astype(dtype)
    else:
        arr = rng.randint(-1000, 1000, (7, 5, 3)).astype(dtype)
    path = str(tmp_path / "a.npy")
    np.save(path, arr)
    got = native.read_npy(path)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, arr.astype(np.float32), rtol=1e-6)


def test_read_npy_large_header_v1(tmp_path):
    # 1-D and 0-d corner cases
    path = str(tmp_path / "b.npy")
    np.save(path, np.arange(10, dtype=np.float32))
    np.testing.assert_array_equal(native.read_npy(path), np.arange(10))


def test_read_wav_pcm16(tmp_path):
    from scipy.io import wavfile

    rng = np.random.RandomState(1)
    samples = (rng.randn(1600) * 8000).astype(np.int16)
    path = str(tmp_path / "a.wav")
    wavfile.write(path, 16000, samples)
    wav, sr = native.read_wav_pcm16(path)
    assert sr == 16000
    np.testing.assert_allclose(wav, samples.astype(np.float32) / 32768.0,
                               atol=1e-7)


def test_read_wav_stereo_downmix(tmp_path):
    from scipy.io import wavfile

    rng = np.random.RandomState(2)
    samples = (rng.randn(800, 2) * 8000).astype(np.int16)
    path = str(tmp_path / "st.wav")
    wavfile.write(path, 22050, samples)
    wav, sr = native.read_wav_pcm16(path)
    assert sr == 22050
    want = (samples.astype(np.float32) / 32768.0).mean(axis=1)
    np.testing.assert_allclose(wav, want, atol=1e-6)


def test_prefetcher_returns_all_items(tmp_path):
    rng = np.random.RandomState(3)
    arrays = [rng.randn(4 + i, 6).astype(np.float32) for i in range(20)]
    paths = []
    for i, arr in enumerate(arrays):
        p = str(tmp_path / f"seq_{i:02d}.npy")
        np.save(p, arr)
        paths.append(p)

    pf = native.NpyPrefetcher(paths, capacity=3, workers=4)
    seen = {}
    for idx, arr in pf:
        seen[idx] = arr
    pf.close()

    assert sorted(seen) == list(range(20))
    for i in range(20):
        np.testing.assert_array_equal(seen[i], arrays[i])


def test_prefetcher_error_on_missing_file(tmp_path):
    p = str(tmp_path / "ok.npy")
    np.save(p, np.zeros((2, 2), np.float32))
    pf = native.NpyPrefetcher([p, str(tmp_path / "missing.npy")], workers=1)
    with pytest.raises(IOError):
        for _ in pf:
            pass
    pf.close()


def test_raster_gouraud_matches_numpy_and_is_fast():
    """The C++ rasterizer must match the numpy fallback pixel-for-pixel
    (same math) and beat it by a wide margin at realistic face counts."""
    import time

    import numpy as np

    from fdm_tpu.data.native import native_available, raster_gouraud
    from fdm_tpu.render.voca_rig import _raster_numpy

    if not native_available():
        import pytest

        pytest.skip("native library not built")

    rng = np.random.default_rng(0)
    F, size = 4000, 256
    centers = rng.uniform(10, size - 10, (F, 1, 2))
    tri_pix = (centers + rng.uniform(-8, 8, (F, 3, 2))).astype(np.float64)
    tri_z = rng.uniform(0.5, 2.0, (F, 3))
    tri_shade = rng.uniform(0.0, 1.0, (F, 3))
    ok = (rng.uniform(size=F) > 0.1).astype(np.uint8)

    img_n = np.full((size, size), 1.0, np.float32)
    zbuf_n = np.full((size, size), np.inf, np.float32)
    t0 = time.perf_counter()
    _raster_numpy(tri_pix, tri_z, tri_shade, ok, size, img_n, zbuf_n)
    t_numpy = time.perf_counter() - t0

    img_c = np.full((size, size), 1.0, np.float32)
    zbuf_c = np.full((size, size), np.inf, np.float32)
    t0 = time.perf_counter()
    assert raster_gouraud(
        np.asarray(tri_pix, np.float32), np.asarray(tri_z, np.float32),
        np.asarray(tri_shade, np.float32), ok, size, img_c, zbuf_c,
    )
    t_native = time.perf_counter() - t0

    # identical coverage up to f32-vs-f64 edge rounding on shared edges
    mismatched = np.abs(img_c - img_n) > 1e-3
    assert mismatched.mean() < 0.002, mismatched.mean()
    assert np.isfinite(zbuf_c).sum() > 0.05 * size * size
    assert t_native < t_numpy, (t_native, t_numpy)


def test_hostile_npy_shapes_rejected(tmp_path):
    """File-supplied shapes are untrusted: an overflow-sized or negative
    shape must make the native loader return an error (numpy fallback),
    never allocate/overflow (round-3 review finding)."""
    import ctypes

    lib = native._load_lib()
    assert lib is not None

    def raw_npy(shape_str, descr="<f8", payload=b"\x00" * 64):
        header = (
            "{'descr': '%s', 'fortran_order': False, 'shape': %s, }"
            % (descr, shape_str)
        ).encode()
        pad = (64 - (10 + len(header) + 1) % 64) % 64
        header += b" " * pad + b"\n"
        return (
            b"\x93NUMPY\x01\x00"
            + len(header).to_bytes(2, "little")
            + header
            + payload
        )

    cases = {
        "overflow.npy": "(2305843009213693952, 2)",  # n*item wraps
        "negative.npy": "(-1,)",
        "oversized.npy": "(1000000,)",  # claims more data than present
    }
    for name, shape_str in cases.items():
        p = tmp_path / name
        p.write_bytes(raw_npy(shape_str))
        data = ctypes.POINTER(ctypes.c_float)()
        shp = (ctypes.c_int64 * 8)()
        ndim = ctypes.c_int()
        rc = lib.fdm_npy_load_f32(
            str(p).encode(), ctypes.byref(data), shp, ctypes.byref(ndim)
        )
        assert rc != 0, name


def test_prefetcher_closed_iteration_raises(tmp_path):
    """Iterating a closed prefetcher must raise, not pass NULL into C++
    (round-3 review finding); close() during blocked-full workers must not
    deadlock (lost-wakeup fix)."""
    paths = []
    for i in range(8):
        p = tmp_path / f"{i}.npy"
        np.save(p, np.full((4, 3), i, np.float32))
        paths.append(str(p))
    pf = native.NpyPrefetcher(paths, capacity=1, workers=2)
    it = iter(pf)
    next(it)  # ring is full; remaining workers are blocked on cv_space
    pf.close()  # must return (join succeeds), not deadlock
    with pytest.raises(RuntimeError, match="closed"):
        next(it)
    pf2 = native.NpyPrefetcher(paths, capacity=2, workers=2)
    pf2.close()
    with pytest.raises(RuntimeError, match="closed"):
        next(iter(pf2))
