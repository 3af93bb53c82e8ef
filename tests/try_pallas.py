"""Direct TPU check of the pallas fast scoring vs the exact path."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
import jax, jax.numpy as jnp
import numpy as np
from top_down_renderer_tpu.filter.scoring import (
    score_all_rotations, rotation_shift, search_shifts,
)
from top_down_renderer_tpu.filter import pallas_score as ps
from top_down_renderer_tpu.maps.polar import polar_stencil

H = W = 1024
C = 6
N = int(os.environ.get("BENCH_N", 102400))
rng = np.random.default_rng(0)
packed = np.zeros((H, W, 8), np.float32)
packed[..., :C] = rng.random((H, W, C)) * 50
packed[..., C] = (rng.random((H, W)) < 0.95).astype(np.float32)
stencil = polar_stencil(100, 25)
scan = (rng.random((C, 100, 25)) * 3).astype(np.float32)
cw = jnp.asarray(np.array([1, 2, 0.5, 1, 1, 1], np.float32))
scale, res = 2.0, 0.5
f = scale * res
mo = ps.pick_crop_size(f, 25)
print("f =", f, "mo =", mo, "dims =", ps.crop_dims(mo), flush=True)

# integer centers -> fast and exact sample identical pixels
centers_i = rng.integers(2, min(H, W) - 2, (N, 2)).astype(np.float32)
scales = np.full(N, scale, np.float32)
thetas = (rng.random(N) * 2 * np.pi).astype(np.float32)

packed_j = jnp.asarray(packed)
maps = ps.build_padded_maps(packed_j)
jax.block_until_ready(maps.stacked)

# exact costs over all rotations (subset of particles for speed)
NSUB = 4096
costs_e, kf_e = score_all_rotations(
    packed_j, jnp.asarray(stencil), jnp.asarray(scan), cw,
    jnp.asarray(centers_i[:NSUB]), jnp.asarray(scales[:NSUB]),
    jnp.asarray(res), num_classes=C, map_resolution=1.0, chunk_size=4096,
)
costs_e = np.asarray(costs_e)

# --- tracked flavor ---
num, den, kf = ps.score_tracked_fast_mo(
    maps, jnp.asarray(stencil), jnp.asarray(scan), cw,
    jnp.asarray(centers_i), jnp.asarray(thetas), f, mo,
)
cost_f = np.asarray(num / den)
kf_f = np.asarray(kf)
s_p = np.asarray(rotation_shift(jnp.asarray(thetas), 100))
ref = costs_e[np.arange(NSUB), s_p[:NSUB]]
got = cost_f[:NSUB]
both = ~np.isnan(ref)
rel = np.abs(ref[both] - got[both]) / np.maximum(np.abs(ref[both]), 1e-9)
print("tracked: rel err med", np.median(rel), "p99",
      np.percentile(rel, 99), "max", rel.max(), flush=True)
print("kf err:", np.abs(np.asarray(kf_e) - kf_f[:NSUB]).max(), flush=True)

# --- init flavor ---
nums, dens, kfi = ps.score_init_fast_mo(
    maps, jnp.asarray(stencil), jnp.asarray(scan), cw,
    jnp.asarray(centers_i), f, mo,
)
ci = np.asarray(nums / dens)
ssh = np.asarray(search_shifts(100, 40))
ref40 = costs_e[:, ssh]
rel40 = np.abs(ref40 - ci[:NSUB]) / np.maximum(np.abs(ref40), 1e-9)
print("init: rel err med", np.median(rel40), "p99",
      np.percentile(rel40, 99), flush=True)

# --- timing ---
def timeit(name, fn, reps=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1000:.1f} ms", flush=True)

st_j, sc_j, c_j, t_j = (jnp.asarray(stencil), jnp.asarray(scan),
                        jnp.asarray(centers_i), jnp.asarray(thetas))
fast_t = jax.jit(lambda c_, t_: ps.score_tracked_fast_mo(maps, st_j, sc_j, cw, c_, t_, f, mo))
timeit("tracked fast jit (100k)", lambda: fast_t(c_j, t_j))
fast_i = jax.jit(lambda c_: ps.score_init_fast_mo(maps, st_j, sc_j, cw, c_, f, mo))
timeit("init fast jit (100k)", lambda: fast_i(c_j))
