"""Numpy-oracle test for the active localizer.

Literal loop-for-loop transcription of the reference's search
(/root/reference/src/active_localizer.cpp:7-82: per-candidate local-map
gather at scale*res=2 with OOB->0, rotation alignment by row shift,
mean pairwise L1 over (pair, class), strict-improvement argmax, ring
early-exit at best >= 6000) compared against the batched jitted
implementation (active/localizer.py::get_best_rel_pos).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from top_down_renderer_tpu.active.localizer import get_best_rel_pos
from top_down_renderer_tpu.maps.polar import polar_stencil

H = W = 150
C = 3
TH, R = 100, 25
RES = 2.0  # the reference gathers candidates at scale*res = 2
DISTS = [50.0, 75.0, 100.0, 125.0]
N_THETA = 16


def _gather_local(packed, stencil, cx, cy):
    """TopDownMapPolar::getLocalMap (top_down_map_polar.cpp:21-53):
    NN gather of every class at round(stencil*res + center), OOB -> 0."""
    out = np.zeros((TH, R, C), np.float32)
    for t in range(TH):
        for j in range(R):
            iy = int(round(float(stencil[t, j, 0] * RES + cy)))
            ix = int(round(float(stencil[t, j, 1] * RES + cx)))
            if 0 <= iy < H and 0 <= ix < W:
                out[t, j] = packed[iy, ix, :C]
    return out


def _align(local, theta):
    """Rotation alignment by circular row shift
    (active_localizer.cpp:31-40): out[j] = orig[(j - rs) % TH]."""
    rs = int(round(theta * TH / (2 * math.pi))) % TH
    return np.roll(local, rs, axis=0)


def _oracle(packed, stencil, means):
    """getBestRelPos (active_localizer.cpp:44-82)."""
    best_diff = 0.0
    best = (0.0, 0.0)
    dist = 50.0
    while best_diff < 6000.0 and dist < 150.0:
        for ti in range(N_THETA):
            theta = ti * (math.pi / 8.0)
            maps = []
            for m in means:
                ang = theta + m[2]
                cx = m[0] + dist * math.cos(ang)
                cy = m[1] + dist * math.sin(ang)
                maps.append(
                    _align(_gather_local(packed, stencil, cx, cy), m[2])
                )
            total, cnt = 0.0, 0
            for i in range(len(maps)):
                for j in range(i):
                    for cls in range(C):
                        total += np.abs(
                            maps[i][..., cls] - maps[j][..., cls]
                        ).sum()
                        cnt += 1
            diff = total / cnt if cnt else float("nan")
            if diff > best_diff:
                best_diff = diff
                best = (dist, theta)
        dist += 25.0
    return best


@pytest.mark.parametrize(
    "seed,k,mag",
    [
        # mag 40: pairwise diffs > 6000 -> ring-0 early exit path
        (0, 2, 40.0),
        (1, 3, 40.0),
        (2, 4, 40.0),
        # mag 2: diffs stay < 6000 -> all four rings searched
        (3, 2, 2.0),
        (4, 3, 2.0),
    ],
)
def test_active_localizer_matches_reference_loops(seed, k, mag):
    rng = np.random.default_rng(seed)
    packed = np.zeros((H, W, 8), np.float32)
    packed[..., :C] = (rng.random((H, W, C)) * mag).astype(np.float32)
    packed[..., C] = 1.0
    stencil = polar_stencil(TH, R).astype(np.float32)
    # hypotheses well inside the map, arbitrary headings (incl. negative)
    means = np.stack(
        [
            rng.uniform(40, 110, k),
            rng.uniform(40, 110, k),
            rng.uniform(-2 * math.pi, 2 * math.pi, k),
        ],
        axis=-1,
    ).astype(np.float32)

    want_d, want_t = _oracle(packed, stencil, means)
    got_d, got_t = get_best_rel_pos(
        jnp.asarray(packed),
        jnp.asarray(stencil),
        jnp.asarray(means),
        jnp.asarray(k),
        C,
        map_resolution=1.0,
    )
    assert float(got_d) == pytest.approx(want_d)
    assert float(got_t) == pytest.approx(want_t, abs=1e-6)


def test_single_hypothesis_returns_zero():
    """One hypothesis -> no pairs -> the reference's NaN diff never
    improves best_diff -> (0, 0)."""
    packed = np.zeros((H, W, 8), np.float32)
    packed[..., 0] = 5.0
    packed[..., C] = 1.0
    stencil = polar_stencil(TH, R).astype(np.float32)
    means = np.array([[75.0, 75.0, 0.3]], np.float32)
    d, t = get_best_rel_pos(
        jnp.asarray(packed),
        jnp.asarray(stencil),
        jnp.asarray(means),
        jnp.asarray(1),
        C,
        map_resolution=1.0,
    )
    assert float(d) == 0.0 and float(t) == 0.0
