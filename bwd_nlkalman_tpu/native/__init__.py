"""ctypes bindings for the native IO runtime (libbnlk_io.so).

Build with `make -C bwd_nlkalman_tpu/native`.  All entry points degrade
gracefully: `available()` is False when the library isn't built and the
pure-Python codecs in bwd_nlkalman_tpu.io take over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libbnlk_io.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.bnlk_read_image.restype = ctypes.POINTER(ctypes.c_float)
    lib.bnlk_read_image.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.bnlk_write_tiff.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.bnlk_write_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.bnlk_write_pfm.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.bnlk_write_flo.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.bnlk_write_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.bnlk_free.argtypes = [ctypes.c_void_p]
    lib.bnlk_loader_create.restype = ctypes.c_void_p
    lib.bnlk_loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.bnlk_loader_next.restype = ctypes.POINTER(ctypes.c_float)
    lib.bnlk_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.bnlk_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def build(quiet: bool = True) -> bool:
    """Compile the native library in place; returns availability."""
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=quiet,
        )
    except Exception:
        return False
    global _lib
    _lib = None
    return _load() is not None


def available() -> bool:
    return _load() is not None


def read_image(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native io not built")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    ptr = lib.bnlk_read_image(path.encode(), w, h, c)
    if not ptr:
        raise IOError(f"native read failed: {path}")
    n = w.value * h.value * c.value
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.bnlk_free(ptr)
    return arr.reshape(h.value, w.value, c.value)


def _as_cfloat(img: np.ndarray):
    img = np.ascontiguousarray(img, np.float32)
    return img, img.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def write_tiff(path: str, img: np.ndarray) -> None:
    lib = _load()
    img = np.atleast_3d(np.asarray(img, np.float32))
    img, p = _as_cfloat(img)
    if lib.bnlk_write_tiff(path.encode(), p, img.shape[1], img.shape[0], img.shape[2]):
        raise IOError(f"native tiff write failed: {path}")


def write_png(path: str, img: np.ndarray, depth: int = 8) -> None:
    lib = _load()
    img = np.atleast_3d(np.asarray(img, np.float32))
    img, p = _as_cfloat(img)
    if lib.bnlk_write_png(path.encode(), p, img.shape[1], img.shape[0], img.shape[2], depth):
        raise IOError(f"native png write failed: {path}")


def write_pfm(path: str, img: np.ndarray) -> None:
    lib = _load()
    img = np.atleast_3d(np.asarray(img, np.float32))
    img, p = _as_cfloat(img)
    if lib.bnlk_write_pfm(path.encode(), p, img.shape[1], img.shape[0], img.shape[2]):
        raise IOError(f"native pfm write failed: {path}")


def write_jpeg(path: str, img: np.ndarray, quality: int = 95) -> None:
    lib = _load()
    img = np.atleast_3d(np.asarray(img, np.float32))
    img, p = _as_cfloat(img)
    if lib.bnlk_write_jpeg(path.encode(), p, img.shape[1], img.shape[0],
                           img.shape[2], quality):
        raise IOError(f"native jpeg write failed: {path}")


def write_flo(path: str, flow: np.ndarray) -> None:
    lib = _load()
    flow, p = _as_cfloat(flow)
    if lib.bnlk_write_flo(path.encode(), p, flow.shape[1], flow.shape[0]):
        raise IOError(f"native flo write failed: {path}")


class FrameLoader:
    """Threaded in-order frame prefetcher over a printf pattern."""

    def __init__(self, pattern: str, first: int, last: int, step: int = 1,
                 nthreads: int = 4, max_queue: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native io not built")
        self._lib = lib
        self._h = lib.bnlk_loader_create(
            pattern.encode(), first, last, step, nthreads, max_queue
        )

    def __iter__(self):
        return self

    def __next__(self) -> tuple[int, np.ndarray]:
        idx = ctypes.c_int()
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        ptr = self._lib.bnlk_loader_next(self._h, idx, w, h, c)
        if not ptr:
            raise StopIteration
        n = w.value * h.value * c.value
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
        self._lib.bnlk_free(ptr)
        return idx.value, arr.reshape(h.value, w.value, c.value)

    def close(self):
        if self._h:
            self._lib.bnlk_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
