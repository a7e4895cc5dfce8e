"""ctypes bindings for the native host-side I/O runtime (native/clstm_io.cc).

Provides PNG decode, line preparation (invert + dewarp + rescale +
transpose + pad), a threaded prefetch loader, and a fast levenshtein —
the native counterparts of io/png.py, io/normalize.py + data/dataset.py's
prepare_line, and utils/metrics.py. Falls back gracefully: ``available()``
is False when the shared library hasn't been built (``make -C native``),
and all call sites gate on it.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_DEWARP_KINDS = {"none": 0, "no": 0, "mean": 1, "center": 2, "dewarp": 2}

_lib = None


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    cands = [
        os.path.join(here, "..", "..", "native", "libclstm_io.so"),
        os.path.join(here, "libclstm_io.so"),
        os.environ.get("CLSTM_IO_LIB", ""),
    ]
    for c in cands:
        if c and os.path.exists(c):
            return os.path.abspath(c)
    return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.clstm_read_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.clstm_read_png.restype = ctypes.c_int
    lib.clstm_write_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int]
    lib.clstm_write_png.restype = ctypes.c_int
    lib.clstm_free.argtypes = [ctypes.c_void_p]
    lib.clstm_levenshtein.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.clstm_levenshtein.restype = ctypes.c_int
    lib.clstm_prepare_line.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.clstm_prepare_line.restype = ctypes.c_int
    lib.clstm_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.clstm_loader_create.restype = ctypes.c_void_p
    lib.clstm_loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.clstm_loader_get.restype = ctypes.c_int
    lib.clstm_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_png(fname: str) -> np.ndarray:
    lib = _load()
    buf = ctypes.POINTER(ctypes.c_float)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.clstm_read_png(fname.encode(), ctypes.byref(buf),
                            ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"native png decode failed: {fname}")
    arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value)).copy()
    lib.clstm_free(buf)
    return arr


def write_png(fname: str, img: np.ndarray) -> None:
    lib = _load()
    a = np.ascontiguousarray(np.clip(img, 0.0, 1.0), np.float32)
    rc = lib.clstm_write_png(
        fname.encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        a.shape[0], a.shape[1])
    if rc != 0:
        raise IOError(f"native png encode failed: {fname}")


def levenshtein(a: Sequence[int], b: Sequence[int]) -> int:
    lib = _load()
    aa = np.ascontiguousarray(a, np.int32)
    bb = np.ascontiguousarray(b, np.int32)
    return lib.clstm_levenshtein(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb))


def prepare_line(img: np.ndarray, target_height: int, pad: int = 16,
                 dewarp: str = "center") -> np.ndarray:
    """Native prepare_line: [h, w] grayscale -> model input [T, H]."""
    lib = _load()
    a = np.ascontiguousarray(img, np.float32)
    buf = ctypes.POINTER(ctypes.c_float)()
    T = ctypes.c_int()
    H = ctypes.c_int()
    lib.clstm_prepare_line(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        a.shape[0], a.shape[1], target_height, pad,
        _DEWARP_KINDS[dewarp.lower()], ctypes.byref(buf),
        ctypes.byref(T), ctypes.byref(H))
    out = np.ctypeslib.as_array(buf, shape=(T.value, H.value)).copy()
    lib.clstm_free(buf)
    return out


class PrefetchLoader:
    """Threaded decode+normalize pipeline over a list of PNG paths.

    Lines are processed by a native pthread pool in file order;
    ``get(i)`` blocks until line i is ready and returns the prepared
    [T, H] float32 input. Use as a context manager.
    """

    def __init__(self, paths: List[str], target_height: int, pad: int = 16,
                 dewarp: str = "center", nthreads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        self._n = len(paths)
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.clstm_loader_create(
            arr, len(paths), target_height, pad,
            _DEWARP_KINDS[dewarp.lower()], nthreads)

    def __len__(self) -> int:
        return self._n

    def get(self, i: int) -> np.ndarray:
        buf = ctypes.POINTER(ctypes.c_float)()
        T = ctypes.c_int()
        H = ctypes.c_int()
        rc = self._lib.clstm_loader_get(self._handle, i, ctypes.byref(buf),
                                        ctypes.byref(T), ctypes.byref(H))
        if rc != 0:
            raise IOError(f"loader: decode failed for line {i}")
        return np.ctypeslib.as_array(buf, shape=(T.value, H.value)).copy()

    def close(self) -> None:
        if self._handle:
            self._lib.clstm_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
