"""ctypes bindings for the native host runtime (native/libeao_host.so).

The data plane of the engine: a C++ pthread prefetcher decodes TUM PNG
frames (zlib-based decoder, no OpenCV) into float buffers while the TPU
computes, with the reference's FIFO/latest-wins queue semantics
(`ros_test/src/message_flow.cc:217-268`). Falls back to PIL when the
shared object hasn't been built (`make -C native`)."""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                         "native", "libeao_host.so")
_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.eao_prefetcher_create.restype = ctypes.c_void_p
    lib.eao_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_float,
        ctypes.c_int, ctypes.c_int]
    lib.eao_prefetcher_next.restype = ctypes.c_int64
    lib.eao_prefetcher_next.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int64]
    lib.eao_prefetcher_destroy.restype = None
    lib.eao_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.eao_decode_png.restype = ctypes.c_int
    lib.eao_decode_png.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def decode_png(data: bytes):
    """Decode a PNG byte string via the native decoder.
    Returns (array, channels, bit_depth) with array [H, W(, C)]."""
    lib = _load()
    assert lib is not None, "build native/libeao_host.so first"
    buf = np.frombuffer(data, np.uint8)
    out = np.zeros(64 * 1024 * 1024, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    rc = lib.eao_decode_png(buf, len(buf), out, out.size,
                            ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(c), ctypes.byref(bd))
    if rc != 0:
        raise ValueError(f"png decode failed rc={rc}")
    W, H, C, BD = w.value, h.value, c.value, bd.value
    n = H * W * C * (BD // 8)
    arr = out[:n]
    if BD == 16:
        arr = arr.reshape(-1, 2)
        arr = (arr[:, 0].astype(np.uint16) << 8) | arr[:, 1]
    if C > 1:
        arr = arr.reshape(H, W, C)
    else:
        arr = arr.reshape(H, W)
    return arr, C, BD


class FramePrefetcher:
    """Iterate (index, timestamp, gray [H,W] f32, depth [H,W] f32 or None)
    with background decoding."""

    def __init__(self, rgb_paths: List[str],
                 depth_paths: Optional[List[str]] = None,
                 timestamps: Optional[List[float]] = None,
                 width: int = 640, height: int = 480,
                 depth_factor: float = 5000.0, latest_wins: bool = False,
                 capacity: int = 4):
        lib = _load()
        assert lib is not None, "build native/libeao_host.so first"
        self._lib = lib
        self._w, self._h = width, height
        n = len(rgb_paths)
        rgb_arr = (ctypes.c_char_p * n)(*[p.encode() for p in rgb_paths])
        self._keep = [rgb_arr]
        if depth_paths:
            dep_arr = (ctypes.c_char_p * n)(*[p.encode()
                                              for p in depth_paths])
        else:
            dep_arr = None
        self._keep.append(dep_arr)
        ts_arr = (ctypes.c_double * n)(*(timestamps or [0.0] * n))
        self._keep.append(ts_arr)
        self._has_depth = bool(depth_paths)
        self._handle = lib.eao_prefetcher_create(
            rgb_arr, dep_arr, ts_arr, n, depth_factor,
            1 if latest_wins else 0, capacity)

    def __iter__(self) -> Iterator[Tuple[int, float, np.ndarray,
                                         Optional[np.ndarray]]]:
        gray = np.zeros(self._h * self._w, np.float32)
        depth = np.zeros(self._h * self._w, np.float32)
        while True:
            ts = ctypes.c_double()
            w = ctypes.c_int()
            h = ctypes.c_int()
            idx = self._lib.eao_prefetcher_next(
                self._handle, gray, depth, ctypes.byref(ts),
                ctypes.byref(w), ctypes.byref(h), gray.size)
            if idx == -1:
                return
            if idx == -2:
                continue  # decode failure: skip frame
            g = gray[:h.value * w.value].reshape(h.value, w.value).copy()
            d = depth[:h.value * w.value].reshape(h.value, w.value).copy() \
                if self._has_depth else None
            yield int(idx), float(ts.value), g, d

    def close(self) -> None:
        if self._handle:
            self._lib.eao_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
