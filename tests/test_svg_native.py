"""SVG loading (native C++ + Python fallback) and end-to-end map build."""

import numpy as np
import pytest

from top_down_renderer_tpu.maps import native
from top_down_renderer_tpu.maps.svg import load_svg

SVG = """<?xml version="1.0"?>
<svg xmlns="http://www.w3.org/2000/svg" width="64" height="48">
  <rect x="4" y="6" width="20" height="10" fill="#ff0000"/>
  <path d="M 30 10 L 50 10 L 50 30 L 30 30 Z" fill="#00ff00"/>
  <polygon points="10,30 20,30 15,40" style="fill:#0000ff"/>
  <path d="m 2 2 l 4 0 l 0 4 z" fill="rgb(255,0,0)"/>
  <path d="M 1 1 L 2 1" fill="#ff0000"/>
</svg>
"""


@pytest.fixture()
def svg_file(tmp_path):
    p = tmp_path / "map.svg"
    p.write_text(SVG)
    return str(p)


def _luts():
    color_lut = np.full((256, 3), 255, np.uint8)
    color_lut[0] = (255, 0, 0)
    color_lut[1] = (0, 255, 0)
    color_lut[2] = (0, 0, 255)
    flatten = -np.ones(256, np.int32)
    flatten[:3] = [0, 1, 2]
    return color_lut, flatten


def test_native_available():
    assert native.available(), "native lib should build in this image"


def test_native_svg_parse(svg_file):
    out = native.parse_svg(svg_file)
    assert out is not None
    (w, h), polys, fills = out
    assert (w, h) == (64.0, 48.0)
    # rect, path-square, triangle, small relative path; the 2-vertex path
    # is dropped
    assert len(polys) == 4
    assert set(int(f) for f in fills) == {0xFF0000, 0x00FF00, 0x0000FF}
    tri = polys[2]
    np.testing.assert_allclose(
        tri, [[10, 30], [20, 30], [15, 40]], atol=1e-5
    )
    rel = polys[3]
    np.testing.assert_allclose(rel, [[2, 2], [6, 2], [6, 6]], atol=1e-5)


def test_load_svg_native_vs_python(svg_file):
    color_lut, flatten = _luts()
    (w, h), polys_nat = load_svg(svg_file, color_lut, flatten, 3)
    # force the python path
    import top_down_renderer_tpu.maps.native as nat_mod

    saved = nat_mod.available
    nat_mod.available = lambda: False
    try:
        (w2, h2), polys_py = load_svg(svg_file, color_lut, flatten, 3)
    finally:
        nat_mod.available = saved
    assert (w, h) == (w2, h2) == (64.0, 48.0)
    for cls in range(3):
        assert len(polys_nat[cls]) == len(polys_py[cls]), cls
        for a, b in zip(polys_nat[cls], polys_py[cls]):
            np.testing.assert_allclose(a, b, atol=1e-4)


def test_native_rasterize_matches_device(svg_file):
    """Native host rasterizer vs the jitted device even-odd fill."""
    import jax.numpy as jnp

    from top_down_renderer_tpu.maps.rasterize import (
        pack_polygons,
        rasterize_class,
    )

    rng = np.random.default_rng(0)
    polys = []
    for _ in range(3):
        n = rng.integers(3, 8)
        ang = np.sort(rng.random(n) * 2 * np.pi)
        rr = 3 + rng.random(n) * 8
        cx, cy = rng.random(2) * 30 + 8
        polys.append(
            np.stack(
                [cx + rr * np.cos(ang), cy + rr * np.sin(ang)], -1
            ).astype(np.float32)
        )
    h = w = 48
    out_nat = native.rasterize_union(
        polys, h, w, cx=w / 2.0, cy=h / 2.0, res=1.0
    )
    edges, ids = pack_polygons(polys)
    dev = np.asarray(
        rasterize_class(
            jnp.asarray(edges), jnp.asarray(ids),
            jnp.asarray([float(w), float(h)]), h, w, len(polys),
        )
    )
    inside_dev = dev == 0.0
    assert np.mean(out_nat.astype(bool) != inside_dev) < 0.01
