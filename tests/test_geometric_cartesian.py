"""Cartesian geometric renderer parity vs a literal numpy port of the
reference's organized-cloud column walk (scan_renderer.cpp:7-53)."""

import numpy as np
import jax.numpy as jnp

from top_down_renderer_tpu.render.geometric import (
    render_geometric_cartesian,
)


def _np_reference(cloud, res, w, h):
    imgs = np.zeros((2, h, w), np.float32)
    hc, wc, _ = cloud.shape
    for idx in range(wc):
        last_pt = np.zeros(3)
        last_ind = np.array([w // 2, h // 2])
        last_high_grad = False
        for idy in range(hc):
            pt = cloud[idy, idx]
            if pt[0] == 0 and pt[1] == 0:
                continue
            x_ind = int(round(pt[0] / res)) + w // 2
            y_ind = int(round(pt[1] / res)) + h // 2
            dist = np.hypot(pt[0] - last_pt[0], pt[1] - last_pt[1])
            with np.errstate(divide="ignore", invalid="ignore"):
                slope = (
                    abs(pt[2] - last_pt[2]) / dist
                    if dist != 0
                    else (np.inf if pt[2] != last_pt[2] else np.nan)
                )
            if slope > 1:
                if 0 <= x_ind < w and 0 <= y_ind < h:
                    imgs[1, y_ind, x_ind] += 1
                last_high_grad = True
            elif slope < 0.3 and not last_high_grad:
                diff = np.array([x_ind, y_ind]) - last_ind
                norm = np.linalg.norm(diff)
                i = 0.0
                step = 1.0 / norm if norm > 0 else np.inf
                while i < 1:
                    ix = int(round(last_ind[0] + i * diff[0]))
                    iy = int(round(last_ind[1] + i * diff[1]))
                    if 0 <= ix < w and 0 <= iy < h:
                        imgs[0, iy, ix] += 1
                    i += step
            else:
                last_high_grad = False
            last_pt = pt.copy()
            last_ind = np.array([x_ind, y_ind])
    return imgs


def test_cartesian_geometric_matches_walk():
    rng = np.random.default_rng(0)
    hc, wc = 32, 64  # organized cloud
    w = h = 48
    cloud = np.zeros((hc, wc, 3), np.float32)
    # columns of a rotating lidar: points at increasing elevation
    r = rng.uniform(2, 20, (hc, wc))
    az = np.linspace(-np.pi, np.pi, wc)[None, :].repeat(hc, 0)
    cloud[..., 0] = r * np.cos(az)
    cloud[..., 1] = r * np.sin(az)
    cloud[..., 2] = rng.uniform(0, 3, (hc, wc))
    cloud[::9, ::3] = 0.0  # invalid points

    ours = np.asarray(
        render_geometric_cartesian(jnp.asarray(cloud), 1.0, w, h)
    )
    ref = _np_reference(cloud, 1.0, w, h)
    # obstacle channel: exact
    np.testing.assert_array_equal(ours[1], ref[1])
    # ground channel: the reference accumulates i += 1/norm in float and
    # our i = k/norm is the same line sampled without accumulation error;
    # a handful of cells on rounding boundaries may differ
    diff = ours[0] != ref[0]
    assert diff.mean() < 0.03, diff.mean()
    assert abs(ours[0].sum() - ref[0].sum()) / ref[0].sum() < 0.01
