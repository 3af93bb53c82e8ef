"""Shared synthetic-world helpers for integration tests and benchmarks.

Builds a small semantic map and generates LiDAR-like semantic point clouds
from a ground-truth pose, consistent with the framework's conventions:
  - scan bearing beta = atan2(x, y)  (scan_renderer_polar.cpp:97)
  - the particle theta is the CCW body rotation psi in map frame;
    map offset (px) of a body point p is R(psi) @ p * scale.
"""

from __future__ import annotations

import numpy as np


def make_world(h: int = 256, w: int = 256):
    """3-class world: class 0 = terrain (fills everything else, low
    localization weight), class 1 = road (strips - init constraint),
    class 2 = buildings (asymmetric blocks - the discriminative landmarks).
    Returns class_maps_binary (3, H, W) (0 = class present)."""
    maps = np.ones((3, h, w), np.float32)
    # road: horizontal strip + a vertical spur (class 1)
    maps[1, 100:111, :] = 0.0
    maps[1, 111:200, 120:131] = 0.0
    # buildings (class 2): an urban corridor flanking the road, with
    # irregular spacing/sizes so the local skyline is position- and
    # orientation-distinctive
    rng = np.random.default_rng(42)
    x = 6
    while x < w - 20:
        sz = int(rng.integers(8, 16))
        gap = int(rng.integers(4, 26))
        maps[2, 82 : 82 + sz, x : x + sz] = 0.0
        x += sz + gap
    x = 14
    while x < w - 20:
        sz = int(rng.integers(6, 13))
        gap = int(rng.integers(10, 40))
        if not np.any(maps[1, 118 : 118 + sz, x : x + sz] == 0):
            maps[2, 118 : 118 + sz, x : x + sz] = 0.0
        x += sz + gap
    for _ in range(10):
        y = int(rng.integers(10, h - 24))
        xx = int(rng.integers(10, w - 24))
        sz = int(rng.integers(8, 16))
        if np.any(maps[1, y : y + sz, xx : xx + sz] == 0):
            continue  # don't build on the road
        maps[2, y : y + sz, xx : xx + sz] = 0.0
    # terrain: exclusive complement (class maps are 0-inside/1-outside, so
    # terrain is ABSENT (1) exactly where road or building is present)
    maps[0] = np.minimum((1 - maps[1]) + (1 - maps[2]), 1.0)
    return maps


def rot2d(psi: float) -> np.ndarray:
    c, s = np.cos(psi), np.sin(psi)
    return np.array([[c, -s], [s, c]], np.float32)


def generate_scan_points(
    class_maps: np.ndarray,
    gt_pos_px: np.ndarray,
    gt_psi: float,
    scale: float,
    max_range_m: float,
    n_pad: int,
    stride: int = 1,
    noise_m: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Points (n_pad, 4): body-frame x, y, z, raw class; padded with zeros
    (the renderer's x==0&&y==0 sentinel)."""
    rng = np.random.default_rng(seed)
    c, h, w = class_maps.shape
    pts = []
    r_inv = rot2d(-gt_psi)
    for cls in range(c):
        ys, xs = np.nonzero(class_maps[cls] == 0)
        if stride > 1:
            ys, xs = ys[::stride], xs[::stride]
        d = np.stack([xs, ys], -1).astype(np.float32) - gt_pos_px[None, :]
        d_m = d / scale
        rng_m = np.linalg.norm(d_m, axis=1)
        keep = (rng_m < max_range_m) & (rng_m > 0.5)
        p_body = (r_inv @ d_m[keep].T).T
        if noise_m > 0:
            p_body = p_body + rng.standard_normal(p_body.shape) * noise_m
        z = np.zeros((p_body.shape[0], 1), np.float32)
        lab = np.full((p_body.shape[0], 1), cls, np.float32)
        pts.append(np.concatenate([p_body, z, lab], axis=1))
    pts = np.concatenate(pts, axis=0)
    if pts.shape[0] > n_pad:
        idx = rng.choice(pts.shape[0], n_pad, replace=False)
        pts = pts[idx]
    out = np.zeros((n_pad, 4), np.float32)
    out[: pts.shape[0]] = pts
    return out
