"""Polar sampling stencil.

Parity port of TopDownMapPolar::samplePtsPolar
(/root/reference/src/top_down_map_polar.cpp:7-19): a fixed grid of
Cartesian offsets for (theta, r) bins, precomputed once and scaled by
(particle scale * range resolution) at query time.

Conventions (traced from the reference):
  theta_i = (i - (Theta-1)/2) * ang_res      for i in [0, Theta)
  r_j     = j / map_resolution               for j in [0, R)
  offset  = (dy, dx) = (cos(theta)*r, sin(theta)*r)
where dy adds to the map row index and dx to the column index
(top_down_map_polar.cpp:28-30: row += center_y, col += center_x).
This matches the scan renderer's theta = atan2(x, y) convention
(scan_renderer_polar.cpp:97): theta=0 points along +y (map row axis).
"""

from __future__ import annotations

import math

import numpy as np


def polar_stencil(
    theta_bins: int = 100,
    range_bins: int = 25,
    ang_res: float | None = None,
    map_resolution: float = 1.0,
) -> np.ndarray:
    """Returns (theta_bins, range_bins, 2) float32 Cartesian offsets
    (dy, dx) in map px per unit of (scale * range_res)."""
    if ang_res is None:
        ang_res = 2.0 * math.pi / theta_bins
    i = np.arange(theta_bins, dtype=np.float32)
    theta = (i - (theta_bins - 1) / 2.0) * ang_res
    r = np.arange(range_bins, dtype=np.float32) / map_resolution
    dy = np.cos(theta)[:, None] * r[None, :]
    dx = np.sin(theta)[:, None] * r[None, :]
    return np.stack([dy, dx], axis=-1).astype(np.float32)
