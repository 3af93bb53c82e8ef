"""Profile the conv fast-path step components at the bench operating
point (mo=24, region=128, window=16, 102400 particles, 1024^2 map)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax, jax.numpy as jnp
import numpy as np
import __graft_entry__ as ge
from top_down_renderer_tpu.config import FilterParams
from top_down_renderer_tpu.filter import conv_score as cs
from top_down_renderer_tpu.filter import pallas_score as ps
from top_down_renderer_tpu.filter.filter import (
    make_tail_fn, make_update_step_fast,
)

n = int(os.environ.get("BENCH_N", 102400))
hw = 1024
c = 6
mo, region, ww, s0 = 24, 128, 16, 10
(state, packed, map_size, stencil, scan, res, _p) = ge._synthetic_setup(
    n, h=hw, w=hw, c=c, cluster=(hw // 2, hw // 2, 100),
    theta_spread=(0.7, 0.15))
res = jnp.asarray(0.5, jnp.float32)
params = FilterParams(fixed_scale=2.0, class_weights=[1.0] * c,
                      force_on_map=True)
maps = ps.build_padded_maps(packed)
cw = jnp.ones(c, jnp.float32)
f = jnp.asarray(1.0, jnp.float32)


def timeit(name, fn, *args, reps=20):
    def fence(o):
        # axon block_until_ready can return early; force a value read
        # of ONE element (np.asarray would ship the whole array over
        # the remote RPC and poison the timing for large outputs)
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(leaf[(0,) * leaf.ndim])
    out = fn(*args); fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/reps*1000:8.3f} ms")
    return out


kb = jax.jit(lambda sc: cs.build_conv_kernel(
    sc, cw, stencil, f, mo, "tracked", 40, ww, s0))
kernel = timeit("build_conv_kernel", kb, scan)

fk = jax.jit(cs.fold_kernel_s2d)
k4 = timeit("fold_kernel_s2d", fk, kernel)

origin = jnp.asarray([maps.pad + 400, maps.pad + 400])
cf = jax.jit(lambda m4, k: cs.cost_field_s2d(m4, k, origin, mo, region, 33))
timeit("cost_field_s2d (incl fold)", cf, maps.padded4d, kernel)

convonly = jax.jit(lambda m4, k4_: jax.lax.conv_general_dilated(
    jax.lax.dynamic_slice(m4, (100, 100, 0), (33 + 13, 33 + 13, 128))[None],
    k4_, (1, 1), "VALID",
    dimension_numbers=("NHWC", "HWIO", "NHWC"),
    preferred_element_type=jnp.float32))
timeit("conv only (prefolded k4)", convonly, maps.padded4d, k4)

tail_fn = make_tail_fn(params, n, 8, 10)
upd = make_update_step_fast(
    params, grid_num_classes=c, map_resolution=1.0, theta_bins=100,
    n_max=n, mode="tracked", mo=mo, gmm_every=10, tail_fn=tail_fn,
    path="conv", region=region, window_w=ww)

# score stage alone (reach inside the update closure via a fresh build)
from top_down_renderer_tpu.filter.conv_score import make_conv_scorer
scorer = make_conv_scorer(mo, region, "tracked", 40, 1.0, ww)
sc_jit = jax.jit(lambda p, s0_: scorer(
    maps.padded3d, maps.padded4d, maps.pad, stencil, scan, cw,
    p.pose_px(), p.theta, f, p.alive, s0_))
timeit("score stage (kernel+conv+gather)", sc_jit, state.particles,
       jnp.asarray(s0, jnp.int32))

cost = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (n,)))
timeit("tail_fn", tail_fn, state, cost, state.particles.theta, map_size)

# the fused step DONATES its input state: chain the output through the
# loop instead of re-passing a deleted buffer
step_fn = lambda s: upd(s, maps, map_size, stencil, scan, res,
                        f_host=1.0, s0=s0)
st = step_fn(state)
float(st.particles.weight[0])
t0 = time.perf_counter()
reps = 20
for _ in range(reps):
    st = step_fn(st)
float(st.particles.weight[0])
print(f"{'full update (score+tail)':34s} "
      f"{(time.perf_counter()-t0)/reps*1000:8.3f} ms")
