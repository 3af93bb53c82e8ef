"""Tests for active localizer, map refiner, replay harness, checkpoint,
GMM, and the runtime node (CPU, exact scoring path)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from top_down_renderer_tpu.config import (
    ClassConfig,
    MapConfig,
    MapParams,
    RuntimeParams,
)
from top_down_renderer_tpu.maps.map import TopDownMap, build_grid
from util_synthetic import make_world, rot2d


def _tdm():
    maps = make_world()
    tdm = TopDownMap(MapParams(map_path="", num_classes=3, resolution=1.0))
    tdm.grid = build_grid(maps, resolution=1.0, trunc_m=50.0)
    tdm.class_maps_binary = maps
    tdm.have_map = True
    tdm.sample_pts_polar(100, 25)
    return tdm, maps


def test_active_localizer_prefers_distinct_views():
    """Two hypotheses with different surroundings: the chosen relative
    position must yield a positive difference, and rings beyond the
    early-exit threshold are not chosen (active_localizer.cpp:44-82)."""
    tdm, _ = _tdm()
    from top_down_renderer_tpu.active import ActiveLocalizer

    al = ActiveLocalizer(tdm)
    means = np.array(
        [[60.0, 105.0, 0.0], [200.0, 105.0, 0.0]], np.float32
    )
    d, t = al.get_best_rel_pos(means)
    assert d in (0.0, 50.0, 75.0, 100.0, 125.0)
    assert 0 <= t < 2 * np.pi
    assert d > 0  # hypotheses differ somewhere


def test_refiner_roundtrip(tmp_path):
    from PIL import Image

    from top_down_renderer_tpu.tools import MapRefiner

    h = w = 32
    orig_dir = tmp_path / "orig"
    orig_dir.mkdir()
    for i in range(6):
        m = np.full((h, w), 255, np.uint8)
        if i == 1:
            m[10:20, 5:25] = 0  # road band
        Image.fromarray(m).save(orig_dir / f"class{i}.png")

    # synthetic occupancy points of class 2 (road in the refiner's 6-class
    # scheme is index 1; use class indices directly)
    pts = np.stack(
        [
            np.random.default_rng(0).uniform(2, 8, 200),
            np.random.default_rng(1).uniform(2, 8, 200),
            np.zeros(200),
        ],
        axis=-1,
    ).astype(np.float32)
    np.savez(tmp_path / "occ.npz", points=pts,
             classes=np.full(200, 2, np.int32))

    ref = MapRefiner(res=1.0)
    refined, viz = ref.refine(
        str(tmp_path / "occ.npz"), str(orig_dir), apply_majority=True
    )
    assert viz.shape == (h, w, 3)
    # majority vote marked class 2 present in the sampled cells
    assert (refined[2] == 0).any()
    assert (tmp_path / "orig" / "map_viz.png").exists()


def test_refiner_parity_disabled_update(tmp_path):
    """With apply_majority=False the rasters pass through unchanged
    (the reference ships the update disabled, refine_map.cpp:123)."""
    from PIL import Image

    from top_down_renderer_tpu.tools import MapRefiner

    orig_dir = tmp_path / "orig"
    orig_dir.mkdir()
    rng = np.random.default_rng(2)
    origs = []
    for i in range(6):
        m = (rng.random((16, 16)) > 0.5).astype(np.uint8) * 255
        origs.append(m)
        Image.fromarray(m).save(orig_dir / f"class{i}.png")
    np.savez(
        tmp_path / "occ.npz",
        points=np.zeros((1, 3), np.float32),
        classes=np.zeros(1, np.int32),
    )
    ref = MapRefiner(res=1.0)
    refined, _ = ref.refine(str(tmp_path / "occ.npz"), str(orig_dir))
    np.testing.assert_array_equal(refined, np.stack(origs))


def test_checkpoint_roundtrip(tmp_path):
    from top_down_renderer_tpu.config import FilterParams
    from top_down_renderer_tpu.filter.filter import ParticleFilter
    from top_down_renderer_tpu.utils import (
        load_filter_state,
        save_filter_state,
    )

    tdm, _ = _tdm()
    pf = ParticleFilter(
        256, tdm, FilterParams(fixed_scale=2.0, class_weights=[1, 1, 1]),
        chunk_size=256,
    )
    path = str(tmp_path / "state.npz")
    save_filter_state(path, pf.state)
    restored = load_filter_state(path, pf.state)
    np.testing.assert_array_equal(
        np.asarray(restored.particles.init_px),
        np.asarray(pf.state.particles.init_px),
    )
    assert int(restored.n_active) == int(pf.state.n_active)


def test_gmm_recovers_clusters():
    from top_down_renderer_tpu.core.grids import Particles
    from top_down_renderer_tpu.filter import gmm as gmm_mod

    rng = np.random.default_rng(0)
    n = 1000
    centers = np.array([[50.0, 50.0], [200.0, 200.0]])
    which = rng.integers(0, 2, n)
    pos = centers[which] + rng.standard_normal((n, 2)) * 3
    p = Particles(
        init_px=jnp.asarray(pos, jnp.float32),
        d_m=jnp.zeros((n, 2), jnp.float32),
        theta=jnp.zeros(n, jnp.float32),
        scale=jnp.ones(n, jnp.float32),
        have_init=jnp.ones(n, bool),
        weight=jnp.ones(n, jnp.float32) / n,
        last_dist=jnp.zeros(n, jnp.float32),
        alive=jnp.ones(n, bool),
    )
    g = gmm_mod.compute_gmm(
        p, jnp.asarray(n), jnp.asarray(1), jax.random.PRNGKey(0)
    )
    # run a few refreshes so the adaptive k can grow to 2
    for i in range(3):
        g = gmm_mod.compute_gmm(
            p, jnp.asarray(n), g.k, jax.random.PRNGKey(i + 1)
        )
    k = int(g.k)
    assert k >= 2
    means = np.asarray(g.means)[:k, :2]
    d0 = np.min(np.linalg.norm(means - centers[0], axis=1))
    d1 = np.min(np.linalg.norm(means - centers[1], axis=1))
    assert d0 < 10 and d1 < 10


def _class_config():
    color_lut = np.full((256, 3), 255, np.uint8)
    color_lut[0], color_lut[1], color_lut[2] = (
        (0, 100, 0), (255, 0, 0), (0, 0, 255),
    )
    return ClassConfig(
        color_lut=color_lut,
        class_to_flattened=[0, 1, 2],
        flattened_to_class=[0, 1, 2],
        exclusivity=[True, True, True],
        loc_weight=[0.1, 1.5, 3.0],
    )


def test_node_replay_convergence(tmp_path):
    """Runtime node driven through the replay harness on a synthetic bag:
    must converge and publish poses (benchmark_loc-style closed loop)."""
    from PIL import Image

    from top_down_renderer_tpu.io import Bag, benchmark_conv, replay
    from top_down_renderer_tpu.runtime.node import TopDownRenderNode

    maps = make_world()
    h, w = maps.shape[1:]
    img = np.zeros((h, w, 3), np.uint8)
    img[maps[0, ::-1] == 0] = (0, 100, 0)
    img[maps[1, ::-1] == 0] = (255, 0, 0)
    img[maps[2, ::-1] == 0] = (0, 0, 255)
    Image.fromarray(img).save(tmp_path / "world.png")

    cc = _class_config()
    mc = MapConfig(raster_path=str(tmp_path / "world.png"), resolution=2.0)
    rt = RuntimeParams(
        particle_count=1024, use_motion_prior=True,
        range_scale_min=1.0, range_scale_max=1.0,
    )

    # record a bag: gt drives along the road
    scale_gt, psi = 2.0, 0.0
    gt = np.array([40.0, 105.0], np.float32)
    world = np.zeros(2)
    stamps, pts_all, offs, p_stamps, p_pos, p_quat = (
        [], [], [0], [], [], []
    )
    rng = np.random.default_rng(0)
    for step in range(20):
        stamp = float(step)
        pts = []
        for cls in range(3):
            ys, xs = np.nonzero(maps[cls] == 0)
            dm = (np.stack([xs, ys], -1) - gt[None]) / scale_gt
            r = np.linalg.norm(dm, axis=1)
            keep = (r < 25.0) & (r > 0.5)
            pb = (rot2d(-psi) @ dm[keep].T).T
            lab = np.full((pb.shape[0], 1), cls, np.float32)
            pts.append(
                np.concatenate([pb, np.zeros_like(lab), lab], 1)
            )
        pts = np.concatenate(pts)[
            rng.permutation(sum(len(p) for p in pts))
        ][:6000]
        stamps.append(stamp)
        pts_all.append(
            np.concatenate(
                [pts, np.zeros((max(0, 6000 - len(pts)), 4))]
            ).astype(np.float32)
        )
        offs.append(offs[-1] + len(pts_all[-1]))
        p_stamps.append(stamp)
        p_pos.append(np.array([*world, 0.0]))
        p_quat.append(
            np.array([0, 0, math.sin(psi / 2), math.cos(psi / 2)])
        )
        d = rot2d(psi) @ np.array([1.5, 0.0])
        world = world + d
        gt = gt + d * scale_gt

    bag = Bag(
        scan_stamps=np.array(stamps),
        scan_points=np.concatenate(pts_all),
        scan_offsets=np.array(offs),
        prior_stamps=np.array(p_stamps),
        prior_pos=np.stack(p_pos),
        prior_quat=np.stack(p_quat),
    )
    bag.save(str(tmp_path / "bag.npz"))
    bag2 = Bag.load(str(tmp_path / "bag.npz"))

    node = TopDownRenderNode(
        cc, mc, rt,
        filter_overrides=dict(
            regularization=0.02, pos_cov=0.1, force_on_map=True
        ),
    )
    rec = replay(node, bag2)
    assert rec["n_scans"] == 20
    assert node.is_converged
    assert len(rec["poses"]) > 0
    ml = node.filter.mean_likelihood()
    assert np.linalg.norm(ml[:2] - gt) < 15.0


def test_adaptive_particle_count_matches_ellipse_formula():
    """Oracle for adaptive_particle_count (particle_filter.cpp:151-158):
    n = sum_k floor(sqrt(l1_k)*sqrt(l2_k)) over the 2x2 position blocks,
    clamped to [3/4 n_active + 10, n_max]."""
    import jax.numpy as jnp

    from top_down_renderer_tpu.core.grids import GMMState
    from top_down_renderer_tpu.filter.gmm import adaptive_particle_count

    rng = np.random.default_rng(7)
    k_max, k = 8, 3
    covs = np.tile(np.eye(3, dtype=np.float32), (k_max, 1, 1))
    for i in range(k):
        a = rng.standard_normal((2, 2)).astype(np.float32)
        covs[i, :2, :2] = a @ a.T * (20.0 + 40.0 * i)
    # inactive slots carry garbage to prove they're masked out
    covs[k:, :2, :2] = 1e6
    g = GMMState(
        means=jnp.zeros((k_max, 3)),
        covs=jnp.asarray(covs),
        k=jnp.asarray(k),
    )

    expected = 0
    for i in range(k):
        l1, l2 = np.linalg.eigvalsh(covs[i, :2, :2])
        expected += int(np.floor(np.sqrt(max(l1, 0)) * np.sqrt(max(l2, 0))))

    n_max = 100_000
    for n_active in (64, 4096):
        got = int(adaptive_particle_count(g, jnp.asarray(n_active), n_max))
        assert got == min(max(expected, 3 * n_active // 4 + 10), n_max)

    # huge ellipses -> clamp at n_max
    g_big = GMMState(
        means=jnp.zeros((k_max, 3)),
        covs=jnp.asarray(covs) * 1e8,
        k=jnp.asarray(k),
    )
    assert int(adaptive_particle_count(g_big, jnp.asarray(64), n_max)) == n_max
