"""Even-odd rasterizer tests vs matplotlib.path oracle + invariants."""

import numpy as np
import jax.numpy as jnp

from top_down_renderer_tpu.maps.rasterize import (
    apply_exclusive,
    pack_polygons,
    rasterize_class,
    rasterize_map,
)


def _oracle_fill(polys, h, w, map_size_xy, resolution=1.0):
    """Literal numpy port of the reference's even-odd crossing test
    (top_down_map.cpp:339-349): py compares against vertex y, px against
    the edge's x-intersection at py."""
    cy, cx = map_size_xy[1] / 2.0, map_size_xy[0] / 2.0
    py = cy + resolution * (np.arange(h) - (h - 1) / 2.0)
    px = cx + resolution * (np.arange(w) - (w - 1) / 2.0)
    inside = np.zeros((h, w), bool)
    for poly in polys:
        cross = np.zeros((h, w), np.int64)
        v = len(poly)
        j = v - 1
        for i in range(v):
            xi, yi = poly[i]
            xj, yj = poly[j]
            straddle = (py[:, None] < yi) != (py[:, None] < yj)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = xi + (xj - xi) * (py - yi) / (yj - yi)
            hit = straddle & (px[None, :] < xint[:, None])
            cross += hit.astype(np.int64)
            j = i
        inside |= cross % 2 == 1
    return np.where(inside, 0.0, 1.0)


def test_square():
    poly = np.array([[2.0, 2.0], [8.0, 2.0], [8.0, 8.0], [2.0, 8.0]])
    edges, ids = pack_polygons([poly])
    out = np.asarray(
        rasterize_class(
            jnp.asarray(edges), jnp.asarray(ids),
            jnp.asarray([12.0, 12.0]), 12, 12, 1,
        )
    )
    ref = _oracle_fill([poly], 12, 12, (12.0, 12.0))
    np.testing.assert_array_equal(out, ref)


def test_random_polygons_match_oracle():
    rng = np.random.default_rng(0)
    polys = []
    for _ in range(4):
        n = rng.integers(3, 9)
        ang = np.sort(rng.random(n) * 2 * np.pi)
        r = 3 + rng.random(n) * 10
        cx, cy = rng.random(2) * 40 + 5
        polys.append(
            np.stack(
                [cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=-1
            ).astype(np.float32)
        )
    edges, ids = pack_polygons(polys)
    out = np.asarray(
        rasterize_class(
            jnp.asarray(edges), jnp.asarray(ids),
            jnp.asarray([50.0, 50.0]), 50, 50, len(polys),
        )
    )
    ref = _oracle_fill(polys, 50, 50, (50.0, 50.0))
    # pixel centers exactly on edges can differ; allow tiny mismatch
    assert np.mean(out != ref) < 0.01


def test_concave_even_odd():
    # self-intersecting bowtie: even-odd rule leaves the center empty
    poly = np.array(
        [[2.0, 2.0], [18.0, 18.0], [18.0, 2.0], [2.0, 18.0]],
        dtype=np.float32,
    )
    edges, ids = pack_polygons([poly])
    out = np.asarray(
        rasterize_class(
            jnp.asarray(edges), jnp.asarray(ids),
            jnp.asarray([20.0, 20.0]), 20, 20, 1,
        )
    )
    ref = _oracle_fill([poly], 20, 20, (20.0, 20.0))
    assert np.mean(out != ref) < 0.02


def test_exclusive_classes():
    # class 1 polygon fully inside class 0 polygon; exclusivity removes the
    # overlap from class 0 (top_down_map.cpp:357-364)
    outer = np.array([[1.0, 1.0], [15.0, 1.0], [15.0, 15.0], [1.0, 15.0]])
    inner = np.array([[5.0, 5.0], [10.0, 5.0], [10.0, 10.0], [5.0, 10.0]])
    maps = rasterize_map(
        [[outer], [inner]], (16.0, 16.0), exclusive_classes=[0, 1]
    )
    maps = np.asarray(maps)
    inner_px = maps[1] == 0
    assert inner_px.any()
    # wherever class 1 is present, class 0 must be marked absent
    assert np.all(maps[0][inner_px] == 1.0)
    # class 0 still present elsewhere inside outer
    assert (maps[0] == 0).any()
