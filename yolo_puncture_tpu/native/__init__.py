"""Native host-geometry extension: builds geometry.cpp with g++ on first use and
exposes it via ctypes.  Production wiring (ops/geometry.py): min_area_rect
prefers the native rotating calipers on every call (the per-frame hot path);
rle_encoding prefers the native encoder; largest-contour tracing serves as the
cv2-absent fallback for mask_to_polygons(largest_only=True) — cv2.findContours
stays first for pixel-exact reference parity.  Pure-Python fallbacks exist for
every entry point (no g++ → same results, slower).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "geometry.cpp")
_SO = os.path.join(_DIR, "_geometry.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _FAILED = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.min_area_rect.restype = ctypes.c_int
            lib.min_area_rect.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.largest_contour.restype = ctypes.c_int64
            lib.largest_contour.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            lib.rle_encode.restype = ctypes.c_int64
            lib.rle_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
    return _LIB


def min_area_rect_native(points: np.ndarray):
    """points (N, 2) → ((cx, cy), (w, h), angle_deg) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    out = np.zeros(5, np.float64)
    rc = lib.min_area_rect(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    return ((out[0], out[1]), (out[2], out[3]), out[4])


def largest_contour_native(mask: np.ndarray) -> Optional[np.ndarray]:
    """binary mask (H, W) → largest contour (N, 2) int32 xy, or None."""
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray((mask > 0).astype(np.uint8))
    h, w = m.shape
    # two-step buffer: real contours are O(perimeter), so try a small buffer
    # first; only serpentine worst cases (O(h·w) boundary, C side answers -2
    # rather than truncating silently) pay the big retry — this keeps a ~30 MB
    # zero-fill out of the per-frame hot path
    for max_pts in (8 * (h + w) + 16, 4 * h * w + 16):
        out = np.empty((max_pts, 2), np.int32)
        n = lib.largest_contour(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_pts,
        )
        if n >= 0:
            return out[:n].copy()
        if n != -2:
            return None
    return None


def rle_encode_native(mask: np.ndarray) -> Optional[list]:
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray((np.asarray(mask).ravel() > 0).astype(np.uint8))
    max_runs = len(m) // 2 + 1
    out = np.zeros(2 * max_runs, np.int64)
    n = lib.rle_encode(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(m),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_runs,
    )
    return out[: 2 * n].tolist()
