"""SVG vector-map loading.

Capability port of TopDownMap::loadSvg (/root/reference/src/top_down_map.cpp:
66-114), which uses vendored nanosvg to extract, per semantic class, the
polygons whose fill color matches the class color, taking only the on-curve
points of each path (every 3rd bezier control point, :93-95) and flipping Y
(:95).

This implementation parses the SVG subset the reference actually consumes
(shapes with solid fill + path/polygon/rect outlines) directly with
xml.etree - no third-party SVG dependency.  A native C++ fast path can be
swapped in via top_down_renderer_tpu.maps.native when built.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Dict, List, Tuple

import numpy as np

_FLOAT_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


def _parse_color(s: str) -> int | None:
    """Parse a fill color to packed 0xRRGGBB, or None if unset."""
    if not s or s in ("none", "transparent"):
        return None
    s = s.strip()
    if s.startswith("#"):
        h = s[1:]
        if len(h) == 3:
            h = "".join(c * 2 for c in h)
        try:
            return int(h, 16) & 0xFFFFFF
        except ValueError:
            return None
    m = re.match(r"rgb\(\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)", s)
    if m:
        r, g, b = (int(m.group(i)) for i in (1, 2, 3))
        return r << 16 | g << 8 | b
    return None


def _style_fill(elem) -> int | None:
    fill = elem.get("fill")
    style = elem.get("style", "")
    if fill is None and style:
        m = re.search(r"fill\s*:\s*([^;]+)", style)
        if m:
            fill = m.group(1)
    return _parse_color(fill) if fill else None


def _path_vertices(d: str) -> List[np.ndarray]:
    """Extract subpath vertex lists from an SVG path 'd' string.

    Only on-curve points are kept (segment endpoints), matching the
    reference's every-3rd-bezier-point sampling of nanosvg output
    (top_down_map.cpp:93-95).
    """
    tokens = re.findall(r"[MmLlHhVvCcSsQqTtAaZz]|" + _FLOAT_RE.pattern, d)
    subpaths: List[List[Tuple[float, float]]] = []
    cur: List[Tuple[float, float]] = []
    pos = (0.0, 0.0)
    start = (0.0, 0.0)
    i = 0
    cmd = ""

    def nums(n):
        nonlocal i
        vals = [float(tokens[i + k]) for k in range(n)]
        i += n
        return vals

    while i < len(tokens):
        t = tokens[i]
        if re.match(r"[A-Za-z]", t):
            cmd = t
            i += 1
            if cmd in "Zz":
                if cur:
                    subpaths.append(cur)
                    cur = []
                pos = start
                continue
        elif not cmd:
            break
        rel = cmd.islower()
        c = cmd.upper()
        if c == "M":
            x, y = nums(2)
            pos = (pos[0] + x, pos[1] + y) if rel else (x, y)
            if cur:
                subpaths.append(cur)
            cur = [pos]
            start = pos
            cmd = "l" if rel else "L"  # subsequent pairs are lineto
        elif c == "L":
            x, y = nums(2)
            pos = (pos[0] + x, pos[1] + y) if rel else (x, y)
            cur.append(pos)
        elif c == "H":
            (x,) = nums(1)
            pos = (pos[0] + x if rel else x, pos[1])
            cur.append(pos)
        elif c == "V":
            (y,) = nums(1)
            pos = (pos[0], pos[1] + y if rel else y)
            cur.append(pos)
        elif c == "C":
            v = nums(6)
            pos = (pos[0] + v[4], pos[1] + v[5]) if rel else (v[4], v[5])
            cur.append(pos)
        elif c == "S" or c == "Q":
            v = nums(4)
            pos = (pos[0] + v[2], pos[1] + v[3]) if rel else (v[2], v[3])
            cur.append(pos)
        elif c == "T":
            v = nums(2)
            pos = (pos[0] + v[0], pos[1] + v[1]) if rel else (v[0], v[1])
            cur.append(pos)
        elif c == "A":
            v = nums(7)
            pos = (pos[0] + v[5], pos[1] + v[6]) if rel else (v[5], v[6])
            cur.append(pos)
        else:
            i += 1
    if cur:
        subpaths.append(cur)
    return [np.asarray(sp, dtype=np.float32) for sp in subpaths if len(sp) >= 3]


def _elem_polygons(elem) -> List[np.ndarray]:
    tag = elem.tag.split("}")[-1]
    if tag == "path":
        return _path_vertices(elem.get("d", ""))
    if tag in ("polygon", "polyline"):
        pts = _FLOAT_RE.findall(elem.get("points", ""))
        arr = np.asarray(pts, dtype=np.float32).reshape(-1, 2)
        return [arr] if arr.shape[0] >= 3 else []
    if tag == "rect":
        x = float(elem.get("x", 0))
        y = float(elem.get("y", 0))
        w = float(elem.get("width", 0))
        h = float(elem.get("height", 0))
        return [
            np.asarray(
                [[x, y], [x + w, y], [x + w, y + h], [x, y + h]],
                dtype=np.float32,
            )
        ]
    return []


def _parse_length(s: str | None) -> float:
    if not s:
        return 0.0
    m = _FLOAT_RE.search(s)
    return float(m.group(0)) if m else 0.0


def _color_to_raw_map(color_lut, flatten_lut) -> Dict[int, int]:
    color_to_raw: Dict[int, int] = {}
    for raw in range(len(flatten_lut)):
        if raw < color_lut.shape[0] and flatten_lut[raw] >= 0:
            r, g, b = (int(v) for v in color_lut[raw][:3])
            color_to_raw.setdefault(r << 16 | g << 8 | b, raw)
    return color_to_raw


def load_svg(
    svg_path: str,
    color_lut: np.ndarray,
    flatten_lut: np.ndarray,
    num_classes: int,
) -> Tuple[Tuple[float, float], List[List[np.ndarray]]]:
    """Load an SVG map: per-flattened-class polygon lists, y-flipped.

    Parity with loadSvg (top_down_map.cpp:66-114): shapes are assigned to the
    raw class whose LUT color equals the shape's fill, then flattened via
    flatten_lut; vertices are (x, height - y).

    Uses the native C++ parser (maps/native.py) when available, else the
    pure-Python fallback below.

    Returns ((width, height), polys_per_class).
    """
    from top_down_renderer_tpu.maps import native

    nat = native.parse_svg(svg_path) if native.available() else None
    if nat is not None:
        (width, height), raw_polys, fills = nat
        color_to_raw = _color_to_raw_map(color_lut, flatten_lut)
        polys: List[List[np.ndarray]] = [[] for _ in range(num_classes)]
        for poly, fill in zip(raw_polys, fills):
            raw = color_to_raw.get(int(fill))
            if raw is None:
                continue
            flat = int(flatten_lut[raw])
            if not (0 <= flat < num_classes):
                continue
            flipped = poly.copy()
            flipped[:, 1] = height - flipped[:, 1]
            polys[flat].append(flipped)
        return (width, height), polys

    tree = ET.parse(svg_path)
    root = tree.getroot()
    width = _parse_length(root.get("width"))
    height = _parse_length(root.get("height"))
    if (width == 0 or height == 0) and root.get("viewBox"):
        vb = _FLOAT_RE.findall(root.get("viewBox"))
        if len(vb) == 4:
            width, height = float(vb[2]), float(vb[3])

    color_to_raw: Dict[int, int] = {}
    for raw in range(len(flatten_lut)):
        if raw < color_lut.shape[0] and flatten_lut[raw] >= 0:
            r, g, b = (int(v) for v in color_lut[raw][:3])
            packed = r << 16 | g << 8 | b
            # first raw class with this color wins (LUT order)
            color_to_raw.setdefault(packed, raw)

    polys: List[List[np.ndarray]] = [[] for _ in range(num_classes)]
    for elem in root.iter():
        fill = _style_fill(elem)
        if fill is None or fill not in color_to_raw:
            continue
        flat = int(flatten_lut[color_to_raw[fill]])
        if flat < 0 or flat >= num_classes:
            continue
        for poly in _elem_polygons(elem):
            flipped = poly.copy()
            flipped[:, 1] = height - flipped[:, 1]
            polys[flat].append(flipped)
    return (width, height), polys
