"""End-to-end map loading: SVG -> rasterize -> EDT -> grid, the npz
preprocessing cache, and the raster-dir round trip."""

import numpy as np

from top_down_renderer_tpu.config import ClassConfig, MapParams
from top_down_renderer_tpu.maps.map import TopDownMap

SVG = """<?xml version="1.0"?>
<svg xmlns="http://www.w3.org/2000/svg" width="96" height="64">
  <rect x="0" y="26" width="96" height="12" fill="#ff0000"/>
  <rect x="10" y="6" width="14" height="10" fill="#0000ff"/>
  <rect x="60" y="44" width="12" height="12" fill="#0000ff"/>
  <rect x="0" y="0" width="96" height="64" fill="#006400"/>
</svg>
"""


def _cc():
    color_lut = np.full((256, 3), 255, np.uint8)
    color_lut[0] = (0, 100, 0)  # terrain
    color_lut[1] = (255, 0, 0)  # road
    color_lut[2] = (0, 0, 255)  # building
    return ClassConfig(
        color_lut=color_lut,
        class_to_flattened=[0, 1, 2],
        flattened_to_class=[0, 1, 2],
        exclusivity=[True, True, False],
        loc_weight=[1.0, 1.0, 2.0],
    )


def test_svg_map_end_to_end(tmp_path):
    svg = tmp_path / "town.svg"
    svg.write_text(SVG)
    cc = _cc()
    params = MapParams(
        map_path=str(svg),
        num_classes=3,
        resolution=1.0,
        flatten_lut=cc.flatten_lut(),
        exclusive_classes=cc.exclusive_classes(),
        class_config=cc,
    )
    tdm = TopDownMap(params)
    assert tdm.have_map
    assert tdm.grid.width == 96 and tdm.grid.height == 64
    # road strip at SVG y 26..38 -> map rows (64 - y): ~26..38 from bottom
    assert 1 in tdm.get_classes_at_point((48, 30))
    # building block at svg (10..24, 6..16) -> map y 48..58
    assert 2 in tdm.get_classes_at_point((15, 52))
    # terrain (exclusive lower class) removed under the road
    assert 0 not in tdm.get_classes_at_point((48, 30))
    # distance field: 10 px right of the building edge, dist ~10
    d = np.asarray(tdm.grid.dist)
    assert 5.0 < d[52, 34, 2] < 15.0
    # raster cache dir written next to the svg (saveRasterizedMaps parity)
    assert (tmp_path / "town_raster_cache" / "class0.png").exists()


def test_npz_cache_roundtrip_and_invalidation(tmp_path):
    svg = tmp_path / "town.svg"
    svg.write_text(SVG)
    cc = _cc()

    def mk(cache_dir, num_classes=3):
        return MapParams(
            map_path=str(svg),
            num_classes=num_classes,
            resolution=1.0,
            flatten_lut=cc.flatten_lut(),
            exclusive_classes=cc.exclusive_classes(),
            class_config=cc,
            cache_dir=str(cache_dir),
        )

    cache = tmp_path / "cache"
    tdm1 = TopDownMap(mk(cache))
    assert (cache / "map_cache.npz").exists()
    d1 = np.asarray(tdm1.grid.dist)

    # second load hits the cache (corrupt the svg to prove it)
    svg.write_text("<svg width='1' height='1'></svg>")
    tdm2 = TopDownMap(mk(cache))
    assert tdm2.have_map
    np.testing.assert_array_equal(np.asarray(tdm2.grid.dist), d1)

    # metadata mismatch invalidates (num_classes change) -> reload from
    # the (now tiny) svg
    tdm3 = TopDownMap(mk(cache, num_classes=2))
    assert tdm3.grid is None or tdm3.grid.width <= 1


def test_raster_dir_roundtrip(tmp_path):
    svg = tmp_path / "town.svg"
    svg.write_text(SVG)
    cc = _cc()
    params = MapParams(
        map_path=str(svg), num_classes=3, resolution=1.0,
        flatten_lut=cc.flatten_lut(),
        exclusive_classes=cc.exclusive_classes(), class_config=cc,
    )
    tdm = TopDownMap(params)
    # load back the saved raster cache dir (loadRasterizedMaps parity)
    params2 = MapParams(
        map_path=str(tmp_path / "town_raster_cache"),
        num_classes=3, resolution=1.0, class_config=cc,
    )
    tdm2 = TopDownMap(params2)
    assert tdm2.have_map
    np.testing.assert_allclose(
        tdm2.class_maps_binary, tdm.class_maps_binary, atol=1 / 255.0
    )
