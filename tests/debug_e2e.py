"""Debug: inspect cost landscape + filter behavior on the synthetic world."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import math
import numpy as np
import jax.numpy as jnp

from top_down_renderer_tpu.config import FilterParams, MapParams
from top_down_renderer_tpu.filter.filter import ParticleFilter
from top_down_renderer_tpu.filter.scoring import (
    score_all_rotations, rotation_shift,
)
from top_down_renderer_tpu.maps.map import TopDownMap, build_grid
from top_down_renderer_tpu.render.semantic import render_semantic_polar
from util_synthetic import generate_scan_points, make_world, rot2d

maps = make_world()
grid = build_grid(maps, resolution=1.0, trunc_m=50.0)
tdm = TopDownMap(MapParams(map_path="", num_classes=3, resolution=1.0))
tdm.grid = grid; tdm.class_maps_binary = maps; tdm.have_map = True
tdm.sample_pts_polar(100, 25)

scale_gt, psi_gt = 2.0, 0.7
gt_pos = np.array([60.0, 105.0], np.float32)
flut = np.arange(256, dtype=np.int32)
res, ang_res = 1.0, 2 * np.pi / 100

pts = generate_scan_points(maps, gt_pos, psi_gt, scale_gt, 25.0, 8192, seed=0)
scan = render_semantic_polar(jnp.asarray(pts), jnp.asarray(flut), res,
                             ang_res, 3, 100, 25)
print("scan counts per class:", np.asarray(scan).sum(axis=(1, 2)))

# cost at gt pose across all rotations, plus at perturbed poses
centers = np.array([
    gt_pos,
    gt_pos + [10, 0],
    gt_pos + [0, 10],
    gt_pos + [30, 30],
    [200.0, 105.0],
], np.float32)
scales = np.full(len(centers), scale_gt, np.float32)
pad = 8 - len(centers) % 8
centers = np.concatenate([centers, np.tile(gt_pos, (pad, 1))])
scales = np.concatenate([scales, np.full(pad, scale_gt, np.float32)])

costs, kf = score_all_rotations(
    grid.dist, jnp.asarray(tdm.stencil), scan, jnp.asarray([0.1, 1.5, 3.0]),
    jnp.asarray(centers), jnp.asarray(scales), jnp.asarray(res),
    num_classes=3, map_resolution=1.0, chunk_size=centers.shape[0],
)
costs = np.asarray(costs)
s_gt = int(np.asarray(rotation_shift(jnp.asarray([psi_gt]), 100))[0])
print("gt shift:", s_gt)
for i in range(5):
    row = costs[i]
    print(f"pose {centers[i]}: cost@gt_shift={row[s_gt]:.4f} "
          f"min={np.nanmin(row):.4f} argmin={np.nanargmin(row)} "
          f"kf={np.asarray(kf)[i]:.2f}")

# now run the filter and trace ML particle
params = FilterParams(pos_cov=0.1, theta_cov=math.pi/100, regularization=0.02,
                      fixed_scale=scale_gt, class_weights=[0.1, 1.5, 3.0],
                      force_on_map=True)
pf = ParticleFilter(2048, tdm, params, seed=0, chunk_size=512)
gt = gt_pos.copy()
for step in range(15):
    pts = generate_scan_points(maps, gt, psi_gt, scale_gt, 25.0, 8192, seed=step)
    scan = render_semantic_polar(jnp.asarray(pts), jnp.asarray(flut), res,
                                 ang_res, 3, 100, 25)
    trans = np.array([1.5, 0.0], np.float32)
    pf.propagate(trans, 0.0)
    pf.update(scan, res)
    gt = gt + (rot2d(psi_gt) @ trans) * scale_gt
    ml = pf.max_likelihood()
    mean = pf.mean_likelihood()
    cov = pf.compute_mean_cov()
    print(f"step {step}: n={pf.num_particles()} gt={gt[:2]} "
          f"ml=({ml[0]:.1f},{ml[1]:.1f},th={ml[2]:.2f}) "
          f"mean=({mean[0]:.1f},{mean[1]:.1f},th={mean[2]:.2f}) "
          f"cov_xx={cov[0,0]:.1f}")
