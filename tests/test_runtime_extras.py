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


def test_grid_map_payload_end_to_end():
    """A raw grid_map-style payload (layers/data/pose) must feed the
    dynamic-map path end-to-end: toImage char conversion + 90-degree
    clockwise rotation in-repo (the reference delegates this to the
    external GridMapComp, top_down_render.cpp:574-593), then
    filter.update_map + deferred particle init."""
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
        cc, MapConfig(dynamic=True, resolution=1.0),
        RuntimeParams(particle_count=64),
        filter_overrides={"fixed_scale": 1.0},
    )
    assert not node.map.have_map
    assert node.filter.state is None  # deferred init (no map yet)

    rows, cols = 96, 96
    mat = np.zeros((rows, cols), np.float32)
    mat[:, 40:48] = 1.0  # road band along matrix rows
    mat[0, 0] = np.nan  # unseen cell -> 255 (unknown)
    payload = {
        "stamp": 1.0,
        "layers": ["semantics", "elevation"],
        "data": {"semantics": mat},
        "pose_x": 0.0,
        "pose_y": 0.0,
        "length_x": float(cols),
        "length_y": float(rows),
    }
    node.aerial_map_grid_callback(payload)
    assert node.map.have_map
    assert node.filter.num_particles() > 0
    # rot90(k=-1): matrix (r, c) -> image (c, rows-1-r); the road band
    # (cols 40:48 of every row) becomes image rows 40:48
    img_road = np.zeros((cols, rows), bool)
    img_road[40:48, :] = True
    # image row 0 at top -> map y flipped in class_maps_from_index_image
    y_img, x = 44, 50
    y_map = rows - 1 - y_img
    assert 1 in node.map.get_classes_at_point((x, y_map))
    assert 1 not in node.map.get_classes_at_point((x, y_map - 30))
    # stale or empty maps are rejected (top_down_render.cpp:575-576)
    ver = node.filter._map_version
    node.aerial_map_grid_callback({**payload, "stamp": 0.5})
    node.aerial_map_grid_callback(
        {**payload, "stamp": 2.0, "length_x": 0.0}
    )
    assert node.filter._map_version == ver
    # a payload without a semantics layer is ignored
    node.aerial_map_grid_callback(
        {**payload, "stamp": 3.0, "layers": ["elevation"]}
    )
    assert node.filter._map_version == ver


def test_async_publish_uses_completed_snapshot():
    """RuntimeParams.async_publish: the publish path consumes the
    freshest COMPLETED filter snapshot without blocking on the
    in-flight step; pre-first-update publishes no-op instead of
    crashing, and after an update the published pose matches the
    blocking path's values."""
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

    def make(async_publish):
        node = TopDownRenderNode(
            cc, MapConfig(dynamic=True, resolution=1.0),
            RuntimeParams(
                particle_count=64, async_publish=async_publish
            ),
            filter_overrides={"fixed_scale": 1.0},
        )
        rows = cols = 96
        mat = np.zeros((rows, cols), np.float32)
        mat[:, 40:48] = 1.0
        node.aerial_map_grid_callback({
            "stamp": 1.0, "layers": ["semantics"],
            "data": {"semantics": mat},
            "pose_x": 0.0, "pose_y": 0.0,
            "length_x": float(cols), "length_y": float(rows),
        })
        return node

    node_a = make(True)
    node_a.publish_pose_est(0.0)  # nothing completed yet: no-op

    rng = np.random.default_rng(21)
    scan = rng.random((3, 100, 25)).astype(np.float32)

    node_b = make(False)
    pf_a, pf_b = node_a.filter, node_b.filter
    pre = pf_a.publish_stats(block=True)  # completes a pre-update snap
    pf_b.publish_stats(block=True)
    for pf in (pf_a, pf_b):
        pf.update(scan, 1.0)
    post = pf_b.publish_stats(block=True)  # blocking: THIS step's stats

    # async: the freshest COMPLETED snapshot - either the pre-update
    # one (transfer still in flight) or the post-update one, never
    # anything else, and never a block
    got = pf_a.publish_stats(block=False)
    assert got is not None
    assert any(
        np.allclose(got[0], ref[0], rtol=1e-6)
        for ref in (pre, post)
    ), (got[0], pre[0], post[0])

    # once the transfer lands, async == blocking for the same step
    pf_a._host_snapshot()
    got2 = pf_a.publish_stats(block=False)
    np.testing.assert_allclose(got2[0], post[0], rtol=1e-6)
    np.testing.assert_allclose(got2[1], post[1], rtol=1e-6)

    # the node publishes through the async path without blocking
    node_a.is_converged = True
    poses = []
    node_a.on("pose_est", poses.append)
    node_a.publish_pose_est(2.0)
    assert poses
    np.testing.assert_allclose(
        poses[0].position[0],
        float(post[0][0] - node_a.map_center[0]),
        rtol=1e-6,
    )


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
