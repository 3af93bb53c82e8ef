"""ctypes bindings to the native host library (native/tdr_native.cpp):
SVG parsing + even-odd rasterization on the host.

Builds on demand with make; callers fall back to the pure-Python
implementations (maps/svg.py, maps/rasterize.py) when the toolchain or
library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtdr_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tdr_svg_parse.restype = ctypes.c_void_p
    lib.tdr_svg_parse.argtypes = [ctypes.c_char_p]
    lib.tdr_svg_free.argtypes = [ctypes.c_void_p]
    lib.tdr_svg_dims.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.tdr_svg_num_polys.restype = ctypes.c_int32
    lib.tdr_svg_num_polys.argtypes = [ctypes.c_void_p]
    lib.tdr_svg_total_verts.restype = ctypes.c_int32
    lib.tdr_svg_total_verts.argtypes = [ctypes.c_void_p]
    lib.tdr_svg_copy.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.uint32),
    ]
    lib.tdr_rasterize.argtypes = [
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_float,
        np.ctypeslib.ndpointer(np.uint8),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_svg(
    path: str,
) -> Optional[Tuple[Tuple[float, float], List[np.ndarray], np.ndarray]]:
    """Parse an SVG natively.  Returns ((w, h), polys, fills) where polys
    is a list of (V, 2) float32 vertex arrays (SVG coords, y down) and
    fills the per-poly packed 0xRRGGBB colors; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.tdr_svg_parse(path.encode())
    if not h:
        return None
    try:
        w = ctypes.c_float()
        hh = ctypes.c_float()
        lib.tdr_svg_dims(h, ctypes.byref(w), ctypes.byref(hh))
        n = lib.tdr_svg_num_polys(h)
        total = lib.tdr_svg_total_verts(h)
        verts = np.zeros(total * 2, np.float32)
        counts = np.zeros(max(n, 1), np.int32)
        fills = np.zeros(max(n, 1), np.uint32)
        if n:
            lib.tdr_svg_copy(h, verts, counts, fills)
        polys = []
        off = 0
        for i in range(n):
            v = counts[i]
            polys.append(verts[off : off + v * 2].reshape(v, 2).copy())
            off += v * 2
        return (float(w.value), float(hh.value)), polys, fills[:n]
    finally:
        lib.tdr_svg_free(h)


def rasterize_union(
    polys: List[np.ndarray],
    h: int,
    w: int,
    cx: float,
    cy: float,
    res: float = 1.0,
) -> Optional[np.ndarray]:
    """Native even-odd union rasterization -> (h, w) uint8 (1 = inside).
    Pixel-center grid matches samplePts (top_down_map.cpp:367-389)."""
    lib = _load()
    if lib is None or not polys:
        return None
    verts = np.concatenate(
        [np.asarray(p, np.float32).reshape(-1) for p in polys]
    )
    counts = np.asarray([len(p) for p in polys], np.int32)
    out = np.zeros(h * w, np.uint8)
    lib.tdr_rasterize(
        np.ascontiguousarray(verts),
        counts,
        len(polys),
        h,
        w,
        float(cx),
        float(cy),
        float(res),
        out,
    )
    return out.reshape(h, w)
