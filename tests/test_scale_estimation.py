"""Unknown-scale estimation end-to-end: log-spaced scale hypotheses
(particle_filter.cpp:57-70), scale noise, convergence of the scale
estimate, and the geometric-mean freeze (:343-357)."""

import math

import numpy as np
import jax.numpy as jnp

from top_down_renderer_tpu.config import FilterParams, MapParams
from top_down_renderer_tpu.filter.filter import ParticleFilter
from top_down_renderer_tpu.maps.map import TopDownMap, build_grid
from top_down_renderer_tpu.render.semantic import render_semantic_polar

from util_synthetic import generate_scan_points, make_world, rot2d


def test_scale_convergence_and_freeze():
    maps = make_world()
    tdm = TopDownMap(MapParams(map_path="", num_classes=3, resolution=1.0))
    tdm.grid = build_grid(maps, 1.0, 50.0)
    tdm.class_maps_binary = maps
    tdm.have_map = True
    tdm.sample_pts_polar(100, 25)

    scale_gt, psi_gt = 2.0, 0.7
    gt = np.array([60.0, 105.0], np.float32)
    params = FilterParams(
        pos_cov=0.1,
        theta_cov=math.pi / 100,
        regularization=0.02,
        fixed_scale=-1.0,  # unknown scale
        class_weights=[0.1, 1.5, 3.0],
        force_on_map=True,
        init_pos_px_x=64.0,
        init_pos_px_y=104.0,
        init_pos_px_cov=10.0,
    )
    pf = ParticleFilter(2048, tdm, params, seed=0, chunk_size=512)

    # multi-scale init: groups of 10 share a position with scales
    # 10^{0..0.9} (particle_filter.cpp:57-70)
    scales0 = np.asarray(pf.state.particles.scale)[:10]
    np.testing.assert_allclose(
        np.sort(scales0), 10 ** (np.arange(10) / 10.0), rtol=1e-5
    )
    assert not pf.is_scale_frozen

    flut = np.arange(256, dtype=np.int32)
    res, ang_res = 1.0, 2 * np.pi / 100
    for step in range(30):
        pts = generate_scan_points(
            maps, gt, psi_gt, scale_gt, 25.0, 8192, seed=step
        )
        scan = render_semantic_polar(
            jnp.asarray(pts), jnp.asarray(flut), res, ang_res, 3, 100, 25
        )
        pf.propagate(np.array([1.5, 0.0], np.float32), 0.0)
        pf.update(scan, res)
        gt = gt + (rot2d(psi_gt) @ np.array([1.5, 0.0])) * scale_gt
        ml = pf.mean_likelihood()
        cov = pf.compute_mean_cov()
        # runtime scale-freeze trigger (top_down_render.cpp:356-360)
        if cov[3, 3] < 0.003 * ml[3] and not pf.is_scale_frozen:
            pf.freeze_scale()

    ml = pf.mean_likelihood()
    assert abs(ml[3] - scale_gt) / scale_gt < 0.1, ml[3]
    cov = pf.compute_mean_cov()
    assert cov[3, 3] < 0.1  # scale posterior collapsed
    if pf.is_scale_frozen:
        # frozen scale must be near gt and uniform across particles
        assert abs(pf.scale() - scale_gt) / scale_gt < 0.1
        s = np.asarray(pf.state.particles.scale)
        assert np.allclose(s, s[0])
