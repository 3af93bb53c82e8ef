"""Scoring parity: the fused MXU gather+correlate vs a literal numpy port
of StateParticle::getCostForRot + TopDownMapPolar::getLocalMap
(state_particle.cpp:112-155, top_down_map_polar.cpp:21-53)."""

import numpy as np
import jax.numpy as jnp

from top_down_renderer_tpu.maps.polar import polar_stencil
from top_down_renderer_tpu.filter.scoring import (
    rotation_shift,
    score_all_rotations,
    search_shifts,
)

TH, R, C = 100, 25, 3


def _np_local_map(packed, stencil, center, scale, res, map_res):
    h, w, _ = packed.shape
    pts = stencil * (scale * res)
    iy = np.rint(pts[..., 0] + center[1] / map_res).astype(np.int64)
    ix = np.rint(pts[..., 1] + center[0] / map_res).astype(np.int64)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    g = packed[np.clip(iy, 0, h - 1), np.clip(ix, 0, w - 1)]
    dists = np.where(valid[..., None], g[..., :C], 0.0)
    known = np.where(valid, g[..., C], 0.0)
    return np.moveaxis(dists, -1, 0), known  # (C, Th, R), (Th, R)


def _np_cost_for_rot(scan, dists, known, weights, rot_shift):
    """Literal port: scan row j pairs map row (j - s) mod Th
    (state_particle.cpp:136-142)."""
    if known.sum() / known.size < 0.5:
        return np.nan
    cost = 0.0
    norm = 0.0
    rolled = np.roll(scan, -rot_shift, axis=1)  # scan[(theta+s) % Th]
    for c in range(C):
        cost += np.sum(rolled[c] * dists[c]) * 0.01 * weights[c]
        norm += np.sum(rolled[c] * known)
    return cost / norm


def test_score_all_rotations_parity():
    rng = np.random.default_rng(0)
    h, w = 120, 140
    packed = np.zeros((h, w, 8), np.float32)
    packed[..., :C] = rng.random((h, w, C)) * 50
    packed[..., C] = (rng.random((h, w)) < 0.9).astype(np.float32)
    stencil = polar_stencil(TH, R, map_resolution=1.0)
    scan = rng.random((C, TH, R)).astype(np.float32) * 3
    weights = np.array([1.0, 2.0, 0.5], np.float32)
    n = 8
    centers = rng.random((n, 2)).astype(np.float32) * [w, h]
    scales = (0.5 + rng.random(n)).astype(np.float32)
    res = 2.0

    costs, kf = score_all_rotations(
        jnp.asarray(packed),
        jnp.asarray(stencil),
        jnp.asarray(scan),
        jnp.asarray(weights),
        jnp.asarray(centers),
        jnp.asarray(scales),
        jnp.asarray(res),
        num_classes=C,
        map_resolution=1.0,
        chunk_size=n,
    )
    costs = np.asarray(costs)

    for p in range(n):
        dists, known = _np_local_map(
            packed, stencil, centers[p], scales[p], res, 1.0
        )
        np.testing.assert_allclose(
            np.asarray(kf)[p], known.mean(), rtol=1e-5
        )
        for s in [0, 1, 17, 50, 99]:
            ref = _np_cost_for_rot(scan, dists, known, weights, s)
            if np.isnan(ref):
                assert np.isnan(costs[p, s])
            else:
                # f32 summation-order tolerance over ~Th*R*C-term dots
                np.testing.assert_allclose(
                    costs[p, s], ref, rtol=2e-3, atol=1e-5
                )


def test_rotation_shift_parity():
    """rot -> bin shift normalization (state_particle.cpp:123-128)."""
    thetas = np.array(
        [0.0, 0.1, np.pi, 2 * np.pi - 0.01, -0.1, -np.pi, 7.0, -7.0]
    )
    ours = np.asarray(rotation_shift(jnp.asarray(thetas), TH))
    for t, s in zip(thetas, ours):
        ref = int(round(t * TH / (2 * np.pi)))
        while ref >= TH:
            ref -= TH
        while ref < 0:
            ref += TH
        assert s == ref, (t, s, ref)


def test_search_shifts():
    # exact half-bin values (odd k -> 2.5k) are float32 rounding-sensitive,
    # as in the reference's accumulated float t (state_particle.cpp:197);
    # verify in float32 like the implementation
    ssh = np.asarray(search_shifts(TH, 40))
    assert len(ssh) == 40
    # shifts must be the rotation_shift image of t_k = k*2pi/40 ...
    t = np.arange(40, dtype=np.float32) * np.float32(2 * np.pi / 40)
    from top_down_renderer_tpu.filter.scoring import rotation_shift
    np.testing.assert_array_equal(
        ssh, np.asarray(rotation_shift(jnp.asarray(t), TH))
    )
    # ... covering [0, TH) monotonically at ~TH/40 spacing (+-1 bin of
    # float32 half-integer rounding, as in the reference's accumulated t)
    assert ssh[0] == 0 and np.all(np.diff(ssh) >= 2)
    np.testing.assert_allclose(ssh, 2.5 * np.arange(40), atol=1.0)
