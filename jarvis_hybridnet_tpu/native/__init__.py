"""ctypes bindings for the native host data pipeline (libjarvis_host.so).

The library is built on demand with the bundled Makefile (g++ + libjpeg +
pthreads). All entry points degrade gracefully: when the toolchain or
libjpeg is unavailable, ``load()`` returns None and callers fall back to the
cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libjarvis_host.so")
_lib = None
_tried = False


def load():
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.jh_decode_jpeg_file.restype = ctypes.c_int
    lib.jh_decode_jpeg_file.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.jh_decode_batch.restype = ctypes.c_int
    lib.jh_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.jh_decode_crop_batch.restype = ctypes.c_int
    lib.jh_decode_crop_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.jh_pipeline_create.restype = ctypes.c_void_p
    lib.jh_pipeline_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.jh_pipeline_next.restype = ctypes.c_int32
    lib.jh_pipeline_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.jh_pipeline_destroy.restype = None
    lib.jh_pipeline_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _c_paths(paths: list[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def probe_jpeg(path: str) -> tuple[int, int] | None:
    """(width, height) of a JPEG, or None."""
    lib = load()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.jh_decode_jpeg_file(path.encode(), None,
                               ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return int(w.value), int(h.value)


def decode_jpeg(path: str) -> np.ndarray | None:
    """Decode a JPEG to an (H, W, 3) RGB uint8 array."""
    lib = load()
    if lib is None:
        return None
    size = probe_jpeg(path)
    if size is None:
        return None
    w, h = size
    out = np.empty((h, w, 3), np.uint8)
    wv = ctypes.c_int32()
    hv = ctypes.c_int32()
    if lib.jh_decode_jpeg_file(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(wv), ctypes.byref(hv),
    ) != 0:
        return None
    return out


def decode_batch(paths: list[str], width: int, height: int,
                 num_threads: int | None = None) -> np.ndarray | None:
    """Threaded decode of n same-sized JPEGs -> (n, H, W, 3) uint8."""
    lib = load()
    if lib is None:
        return None
    if num_threads is None:
        num_threads = min(len(paths), os.cpu_count() or 1)
    out = np.empty((len(paths), height, width, 3), np.uint8)
    ok = lib.jh_decode_batch(
        _c_paths(paths), len(paths), out.ctypes.data_as(ctypes.c_void_p),
        width, height, num_threads,
    )
    return out if ok == len(paths) else None


def decode_crop_batch(paths: list[str], centers: np.ndarray, bbox: int,
                      width: int, height: int,
                      num_threads: int | None = None) -> np.ndarray | None:
    """Threaded decode + centered crop -> (n, bbox, bbox, 3) uint8.
    centers: (n, 2) int32 (x, y), clamped inside the frame like the
    reference's crop logic."""
    lib = load()
    if lib is None:
        return None
    if num_threads is None:
        num_threads = min(len(paths), os.cpu_count() or 1)
    centers = np.ascontiguousarray(centers, np.int32)
    out = np.empty((len(paths), bbox, bbox, 3), np.uint8)
    ok = lib.jh_decode_crop_batch(
        _c_paths(paths), len(paths),
        centers.ctypes.data_as(ctypes.c_void_p), bbox,
        out.ctypes.data_as(ctypes.c_void_p), width, height, num_threads,
    )
    return out if ok == len(paths) else None


class FramesetPipeline:
    """Prefetching multi-camera frameset decoder (background C++ threads)."""

    def __init__(self, framesets: list[list[str]], width: int, height: int,
                 centers: np.ndarray | None = None, bbox: int = 0,
                 num_threads: int | None = None, prefetch: int = 2):
        lib = load()
        if lib is None:
            raise RuntimeError("native pipeline unavailable")
        self._lib = lib
        self.cameras = len(framesets[0])
        self.num_items = len(framesets)
        self.width, self.height, self.bbox = width, height, bbox
        flat = [p for fs in framesets for p in fs]
        self._paths = _c_paths(flat)  # keep alive
        if centers is not None:
            centers = np.ascontiguousarray(centers, np.int32)
            self._centers = centers  # keep alive
            cptr = centers.ctypes.data_as(ctypes.c_void_p)
        else:
            self._centers = None
            cptr = None
        if num_threads is None:
            num_threads = os.cpu_count() or 1
        self._handle = lib.jh_pipeline_create(
            self._paths, self.num_items, self.cameras, cptr, bbox,
            width, height, num_threads, prefetch,
        )

    def __iter__(self):
        side = self.bbox if self.bbox > 0 else None
        h = side or self.height
        w = side or self.width
        while True:
            out = np.empty((self.cameras, h, w, 3), np.uint8)
            idx = self._lib.jh_pipeline_next(
                self._handle, out.ctypes.data_as(ctypes.c_void_p)
            )
            if idx < 0:
                return
            yield idx, out

    def close(self):
        if self._handle:
            self._lib.jh_pipeline_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
