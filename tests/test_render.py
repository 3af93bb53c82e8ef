"""Scan renderer parity vs direct numpy loops implementing the reference
binning (scan_renderer_polar.cpp:83-109, scan_renderer.cpp:55-78,
scan_renderer_polar.cpp:6-81)."""

import numpy as np
import jax.numpy as jnp

from top_down_renderer_tpu.render.semantic import (
    render_semantic_cartesian,
    render_semantic_polar,
)
from top_down_renderer_tpu.render.geometric import render_geometric_polar

TH, R = 100, 25


def _np_polar_semantic(points, flut, res, ang_res, c, th, r_bins):
    imgs = np.zeros((c, th, r_bins), np.float32)
    for x, y, _z, cls in points:
        if x == 0 and y == 0:
            continue
        theta = np.arctan2(x, y)
        r = np.sqrt(x * x + y * y)
        ti = int(np.round(theta / ang_res)) + th // 2
        ri = int(np.round(r / res))
        if 0 <= ti < th and 0 <= ri < r_bins:
            f = flut[int(cls)]
            if f >= 0:
                imgs[f, ti, ri] += 1
    return imgs


def test_polar_semantic_matches_reference_binning():
    rng = np.random.default_rng(0)
    n, c = 5000, 4
    pts = np.zeros((n, 4), np.float32)
    pts[:, :2] = rng.standard_normal((n, 2)) * 30
    pts[:, 2] = rng.standard_normal(n)
    pts[:, 3] = rng.integers(0, 8, n)
    pts[::97, :2] = 0.0  # some invalid points
    flut = -np.ones(256, np.int32)
    flut[:8] = [0, 1, 2, 3, -1, 0, 1, 2]
    res, ang_res = 2.0, 2 * np.pi / TH

    ours = np.asarray(
        render_semantic_polar(
            jnp.asarray(pts), jnp.asarray(flut), res, ang_res, c, TH, R
        )
    )
    ref = _np_polar_semantic(pts, flut, res, ang_res, c, TH, R)
    np.testing.assert_array_equal(ours, ref)


def test_cartesian_semantic():
    rng = np.random.default_rng(1)
    n, c, w, h = 3000, 3, 64, 48
    pts = np.zeros((n, 4), np.float32)
    pts[:, :2] = rng.standard_normal((n, 2)) * 20
    pts[:, 3] = rng.integers(0, 3, n)
    flut = -np.ones(256, np.int32)
    flut[:3] = [0, 1, 2]
    res = 1.0

    ours = np.asarray(
        render_semantic_cartesian(
            jnp.asarray(pts), jnp.asarray(flut), res, c, w, h
        )
    )
    ref = np.zeros((c, h, w), np.float32)
    for x, y, _z, cls in pts:
        if x == 0 and y == 0:
            continue
        xi = int(np.round(x / res)) + w // 2
        yi = int(np.round(y / res)) + h // 2
        if 0 <= xi < w and 0 <= yi < h:
            ref[int(cls), yi, xi] += 1
    np.testing.assert_array_equal(ours, ref)


def _np_polar_geometric(points, res, ang_res, th, r_bins):
    """Literal reference walk (scan_renderer_polar.cpp:6-81)."""
    imgs = np.zeros((2, th, r_bins), np.float32)
    bins = [[] for _ in range(th)]
    for x, y, z in points:
        if x == 0 and y == 0:
            continue
        theta = np.arctan2(x, y)
        r = np.sqrt(x * x + y * y)
        ti = int(np.clip(np.round(theta / ang_res) + th // 2, 0, th - 1))
        bins[ti].append((x, y, z, r))
    for ti, b in enumerate(bins):
        b.sort(key=lambda p: -p[3])
        last = np.zeros(3)
        last_high_grad = False
        last_r_ind = 0
        for x, y, z, r in b:
            dist = np.hypot(x - last[0], y - last[1])
            with np.errstate(divide="ignore", invalid="ignore"):
                slope = abs(z - last[2]) / dist if dist != 0 else (
                    np.inf if z != last[2] else np.nan
                )
            r_ind = int(np.round(r / res))
            if slope > 1:
                if 0 <= r_ind < r_bins:
                    imgs[1, ti, r_ind] += 1
                last_high_grad = True
            elif slope < 0.3 and not last_high_grad:
                for i in range(last_r_ind, r_ind + 1):
                    if i < r_bins:
                        imgs[0, ti, i] += 1
            else:
                last_high_grad = False
            last = np.array([x, y, z])
            last_r_ind = r_ind
    return imgs


def test_polar_geometric_matches_reference_walk():
    rng = np.random.default_rng(2)
    n = 2000
    pts = np.zeros((n, 4), np.float32)
    pts[:, :2] = rng.standard_normal((n, 2)) * 25
    pts[:, 2] = rng.standard_normal(n) * 2
    pts[::53, :2] = 0.0
    res, ang_res = 2.0, 2 * np.pi / TH

    ours = np.asarray(
        render_geometric_polar(jnp.asarray(pts), res, ang_res, TH, R)
    )
    ref = _np_polar_geometric(pts[:, :3], res, ang_res, TH, R)
    np.testing.assert_array_equal(ours, ref)
