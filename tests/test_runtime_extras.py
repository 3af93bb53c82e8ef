"""Cartesian local-map gather, debug viz, node config loading."""

import numpy as np

from top_down_renderer_tpu.config import MapParams
from top_down_renderer_tpu.maps.map import TopDownMap, build_grid
from util_synthetic import make_world


def _tdm():
    maps = make_world()
    tdm = TopDownMap(MapParams(map_path="", num_classes=3, resolution=1.0))
    tdm.grid = build_grid(maps, resolution=1.0, trunc_m=50.0)
    tdm.class_maps_binary = maps
    tdm.have_map = True
    tdm.sample_pts_polar(100, 25)
    return tdm


def test_cartesian_local_map_identity():
    """rot=0, res=1 window equals a direct slice of the distance field
    (top_down_map.cpp:429-459)."""
    tdm = _tdm()
    h = w = 21
    center = (60.0, 105.0)
    dists, mask = tdm.get_local_map_cartesian(center, 0.0, 1.0, h, w)
    full = np.asarray(tdm.grid.dist)
    y0 = int(center[1]) - h // 2
    x0 = int(center[0]) - w // 2
    ref = np.moveaxis(
        full[y0 : y0 + h, x0 : x0 + w, :3], -1, 0
    )
    np.testing.assert_allclose(dists, ref, atol=1e-5)
    assert mask.sum() == 0  # fully known region


def test_cartesian_local_map_rotation_and_oob():
    tdm = _tdm()
    # 90-degree rotation maps the row axis onto the column axis
    d0, _ = tdm.get_local_map_cartesian((128, 128), 0.0, 1.0, 31, 31)
    d90, _ = tdm.get_local_map_cartesian(
        (128, 128), np.pi / 2, 1.0, 31, 31
    )
    # at rot 90: sample(py, px) = map[cy - px, cx + py], so
    # d90[i, j] = d0[n-1-j, i] = flipud(d0).T
    np.testing.assert_allclose(
        d90[1], np.flipud(d0[1]).T, atol=1e-4
    )
    # far out of bounds -> dist 0 / mask 1
    d_o, m_o = tdm.get_local_map_cartesian((-500, -500), 0.0, 1.0, 5, 5)
    assert np.all(d_o == 0) and np.all(m_o == 1)


def test_run_node_config_loading(tmp_path):
    import sys, os
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts"),
    )
    import run_node

    (tmp_path / "classes.yaml").write_text(
        "classes:\n"
        "  - {name: a, color: [0, 100, 0], flattened_id: 0,"
        " exclusive: true, loc_weight: 0.5}\n"
        "  - {name: b, color: [255, 0, 0], flattened_id: 1,"
        " exclusive: true, loc_weight: 1.0}\n"
    )
    (tmp_path / "map.yaml").write_text(
        "dynamic: false\nraster_path: ''\nresolution: 2.0\n"
    )
    (tmp_path / "node.yaml").write_text(
        "world:\n  classes: classes.yaml\n  map: map.yaml\n"
        "runtime:\n  particle_count: 128\n"
        "filter:\n  pos_cov: 0.2\n  init_pos_px_x: none\n"
        "  init_pos_m_x: none\n"
    )
    cc, mc, rt, fo = run_node.load_config(str(tmp_path / "node.yaml"))
    assert cc.num_classes == 2
    assert mc.resolution == 2.0
    assert rt.particle_count == 128
    assert fo["pos_cov"] == 0.2
    assert fo["init_pos_px_x"] == -1.0  # 'none' sentinel
    assert fo["init_pos_m_x"] == float("inf")


def test_node_visualize_analog():
    from top_down_renderer_tpu.config import (
        ClassConfig,
        MapConfig,
        RuntimeParams,
    )
    from top_down_renderer_tpu.runtime.node import TopDownRenderNode

    color_lut = np.full((256, 3), 255, np.uint8)
    cc = ClassConfig(
        color_lut=color_lut,
        class_to_flattened=[0, 1, 2],
        flattened_to_class=[0, 1, 2],
        exclusivity=[True] * 3,
        loc_weight=[1.0] * 3,
    )
    node = TopDownRenderNode(
        cc, MapConfig(resolution=1.0),
        RuntimeParams(particle_count=64),
    )
    img = node.visualize_analog(np.array([[0.0, 25.0], [50.0, 100.0]]),
                                50.0)
    assert img.shape == (2, 2, 3)
    assert img[0, 0, 0] == 0 and img[1, 0, 0] >= 254
    assert img[1, 1, 0] == 255  # clipped
