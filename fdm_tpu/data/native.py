"""ctypes bindings for the native data runtime (native/libfdm_native.so).

Fast host-side .npy/.wav decode and a multi-threaded prefetch ring — the
TPU-framework equivalent of the reference's torch DataLoader worker processes
(reference train/train_mead_vqvae.py:44, num_workers=10). Falls back to
numpy when the shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

_MAX_DIMS = 8
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libfdm_native.so",
)
_lib = None


def _load_lib(path: str = _LIB_PATH):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.fdm_npy_load_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
    ]
    lib.fdm_npy_load_f32.restype = ctypes.c_int
    lib.fdm_wav_load_pcm16.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.fdm_wav_load_pcm16.restype = ctypes.c_int
    lib.fdm_free.argtypes = [ctypes.c_void_p]
    lib.fdm_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.fdm_prefetcher_create.restype = ctypes.c_void_p
    lib.fdm_prefetcher_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.fdm_prefetcher_next.restype = ctypes.c_int
    lib.fdm_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.fdm_raster_gouraud.argtypes = [
        _f32p, _f32p, _f32p,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int, _f32p, _f32p,
    ]
    lib.fdm_raster_gouraud.restype = None
    if hasattr(lib, "fdm_raster_pbr"):
        lib.fdm_raster_pbr.argtypes = [
            _f32p, _f32p, _f32p, _f32p,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int, _f32p, _f32p, _f32p,
        ]
        lib.fdm_raster_pbr.restype = None
    _lib = lib
    return lib


def raster_gouraud(tri_pix: np.ndarray, tri_z: np.ndarray,
                   tri_shade: np.ndarray, ok: np.ndarray,
                   size: int, img: np.ndarray, zbuf: np.ndarray) -> bool:
    """Z-buffered Gouraud fill of pre-projected triangles into img/zbuf
    (in place). Returns False when the native library isn't built — the
    caller falls back to the numpy loop."""
    lib = _load_lib()
    if lib is None:
        return False
    lib.fdm_raster_gouraud(
        np.ascontiguousarray(tri_pix, np.float32),
        np.ascontiguousarray(tri_z, np.float32),
        np.ascontiguousarray(tri_shade, np.float32),
        np.ascontiguousarray(ok, np.uint8),
        tri_pix.shape[0], size, img, zbuf,
    )
    return True


def raster_pbr(tri_pix: np.ndarray, tri_z: np.ndarray,
               tri_nrm: np.ndarray, tri_pos: np.ndarray, ok: np.ndarray,
               size: int, params: np.ndarray, img: np.ndarray,
               zbuf: np.ndarray) -> bool:
    """Z-buffered PER-FRAGMENT glTF-PBR fill: perspective-correct normal and
    position interpolation, per-pixel BRDF (what pyrender's mesh.frag does).
    `params` packs the shading constants (see fdm_raster_pbr). Returns False
    when the native library isn't built or predates the symbol — the caller
    falls back to the numpy loop."""
    lib = _load_lib()
    if lib is None or not hasattr(lib, "fdm_raster_pbr"):
        return False
    lib.fdm_raster_pbr(
        np.ascontiguousarray(tri_pix, np.float32),
        np.ascontiguousarray(tri_z, np.float32),
        np.ascontiguousarray(tri_nrm, np.float32),
        np.ascontiguousarray(tri_pos, np.float32),
        np.ascontiguousarray(ok, np.uint8),
        tri_pix.shape[0], size,
        np.ascontiguousarray(params, np.float32), img, zbuf,
    )
    return True


def build_native(force: bool = False) -> bool:
    """Compile native/libfdm_native.so with make; returns availability.

    Always invokes make when the source tree is present (incremental, a
    no-op when fresh) — an exists() short-circuit would silently test and
    run against a stale .so after source edits. If make relinks the
    library while a handle is already cached, the cache is dropped so the
    next _load_lib() dlopens the fresh binary (the old mapping stays
    resident but unreferenced). A failed compile is surfaced and reported
    as unavailable rather than silently falling back to the stale .so."""
    global _lib
    native_dir = os.path.dirname(_LIB_PATH)
    if not os.path.exists(os.path.join(native_dir, "Makefile")):
        # installed without sources (lib shipped prebuilt)
        return os.path.exists(_LIB_PATH)

    def _mtime():
        try:
            return os.stat(_LIB_PATH).st_mtime_ns
        except OSError:
            return None

    before = _mtime()
    try:
        args = ["make", "-C", native_dir] + (["-B"] if force else [])
        subprocess.run(args, check=True, capture_output=True)
    except FileNotFoundError:
        # no make binary: use whatever is already built
        return os.path.exists(_LIB_PATH)
    except subprocess.CalledProcessError as e:
        import sys
        stderr = (e.stderr or b"").decode(errors="replace")[-2000:]
        print(
            f"build_native: make failed (rc={e.returncode}):\n{stderr}",
            file=sys.stderr,
        )
        return False
    if _lib is not None and _mtime() != before:
        _lib = None  # relinked: drop the stale dlopen handle
    return os.path.exists(_LIB_PATH)


def native_available() -> bool:
    return _load_lib() is not None


def _own_array(lib, ptr, shape) -> np.ndarray:
    n = int(np.prod(shape))
    buf = np.ctypeslib.as_array(ptr, shape=(n,))
    out = np.array(buf, dtype=np.float32).reshape(shape)  # copy out
    lib.fdm_free(ptr)
    return out


def read_npy(path: str) -> np.ndarray:
    """Load a .npy as float32; native decode when available, else numpy."""
    lib = _load_lib()
    if lib is None:
        return np.load(path).astype(np.float32)
    data = ctypes.POINTER(ctypes.c_float)()
    shape = (ctypes.c_int64 * _MAX_DIMS)()
    ndim = ctypes.c_int()
    rc = lib.fdm_npy_load_f32(
        path.encode(), ctypes.byref(data), shape, ctypes.byref(ndim)
    )
    if rc != 0:  # unsupported dtype/layout -> numpy fallback
        return np.load(path).astype(np.float32)
    return _own_array(lib, data, tuple(shape[: ndim.value]))


def read_wav_pcm16(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """(samples float32 mono in [-1, 1], sample_rate) or None if not PCM16."""
    lib = _load_lib()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_int16)()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.fdm_wav_load_pcm16(
        path.encode(), ctypes.byref(data), ctypes.byref(n), ctypes.byref(sr),
        ctypes.byref(ch),
    )
    if rc != 0:
        return None
    buf = np.ctypeslib.as_array(data, shape=(n.value,))
    wav = np.array(buf, dtype=np.float32) / 32768.0
    lib.fdm_free(ctypes.cast(data, ctypes.c_void_p))
    if ch.value > 1:
        wav = wav.reshape(-1, ch.value).mean(axis=1)
    return wav, sr.value


class NpyPrefetcher:
    """Iterate (index, array) over many .npy files, decoded by a C++ thread
    pool with a bounded ready-queue (completion order, not submission order)."""

    def __init__(self, paths: List[str], capacity: int = 8, workers: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native library not built; run `make -C native` or use "
                "fdm_tpu.data.native.build_native()"
            )
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._keepalive = arr
        self._handle = lib.fdm_prefetcher_create(
            arr, len(self._paths), capacity, workers
        )

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        lib = self._lib
        while True:
            if self._handle is None:
                # closed (possibly mid-iteration); a NULL handle would
                # segfault in fdm_prefetcher_next
                raise RuntimeError("NpyPrefetcher is closed")
            data = ctypes.POINTER(ctypes.c_float)()
            shape = (ctypes.c_int64 * _MAX_DIMS)()
            ndim = ctypes.c_int()
            index = ctypes.c_int()
            rc = lib.fdm_prefetcher_next(
                self._handle, ctypes.byref(data), shape, ctypes.byref(ndim),
                ctypes.byref(index),
            )
            if rc == 1:
                return
            if rc == -1:
                raise IOError(f"failed to load {self._paths[index.value]!r}")
            yield index.value, _own_array(
                lib, data, tuple(shape[: ndim.value])
            )

    def close(self):
        if self._handle:
            self._lib.fdm_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
