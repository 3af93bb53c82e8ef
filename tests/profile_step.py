"""Profile the PF step components on the current device."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax, jax.numpy as jnp
import numpy as np
import __graft_entry__ as ge
from top_down_renderer_tpu.config import FilterParams
from top_down_renderer_tpu.filter.scoring import score_all_rotations, build_circulants
from top_down_renderer_tpu.filter import gmm as gmm_mod
from top_down_renderer_tpu.filter.particles import propagate
from top_down_renderer_tpu.filter.resample import systematic_resample

n = int(os.environ.get("BENCH_N", 102400))
hw = int(os.environ.get("BENCH_MAP", 1024))
chunk = int(os.environ.get("BENCH_CHUNK", 4096))
c = 6
(state, packed, map_size, stencil, scan, res, _p) = ge._synthetic_setup(n, h=hw, w=hw, c=c)
params = FilterParams(fixed_scale=2.0, class_weights=[1.0]*c, force_on_map=True)
cw = jnp.ones(c, jnp.float32)

def timeit(name, f, *args, reps=5):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/reps
    print(f"{name:32s} {dt*1000:9.2f} ms")
    return out

p = state.particles
score = jax.jit(lambda pk, st, sc, ctr, scl: score_all_rotations(
    pk, st, sc, cw, ctr, scl, res, num_classes=c, map_resolution=1.0, chunk_size=chunk))
timeit("score_all_rotations", score, packed, stencil, scan, p.pose_px(), p.scale)

circ = jax.jit(lambda sc: build_circulants(sc, cw))
timeit("build_circulants", circ, scan)

prop = jax.jit(lambda p, k: propagate(p, k, jnp.asarray([1.0,0.0]), jnp.asarray(0.0), params, jnp.asarray(True)))
timeit("propagate", prop, p, jax.random.PRNGKey(0))

g = jax.jit(lambda p, k: gmm_mod.compute_gmm(p, jnp.asarray(n), jnp.asarray(1), k))
timeit("compute_gmm", g, p, jax.random.PRNGKey(0))

rs = jax.jit(lambda p, w, k: systematic_resample(p, w, jnp.asarray(n), jnp.asarray(n), k))
timeit("resample", rs, p, p.weight, jax.random.PRNGKey(0))

# gather-only vs matmul-only inside scoring
def gather_only(pk, st, ctr, scl):
    h, w_, cp = pk.shape
    flat = pk.reshape(h*w_, cp)
    sten = st.reshape(-1, 2)
    def chunk_fn(args):
        ctr_, scl_ = args
        f = (scl_ * res)[:, None]
        yy = sten[None,:,0]*f + ctr_[:,None,1]
        xx = sten[None,:,1]*f + ctr_[:,None,0]
        iy = jnp.round(yy).astype(jnp.int32); ix = jnp.round(xx).astype(jnp.int32)
        lin = jnp.clip(iy,0,h-1)*w_ + jnp.clip(ix,0,w_-1)
        g = jnp.take(flat, lin, axis=0)
        return jnp.sum(g, axis=(1,2))
    out = jax.lax.map(chunk_fn, (ctr.reshape(-1,chunk,2), scl.reshape(-1,chunk)))
    return out
go = jax.jit(gather_only)
timeit("gather_only", go, packed, stencil, p.pose_px(), p.scale)

def matmul_only(sc, key):
    cost_circ, _ = build_circulants(sc, cw)
    x = jax.random.normal(key, (chunk, 2500*c))
    def f(_, x):
        return None, jnp.dot(x, cost_circ, preferred_element_type=jnp.float32)
    out, _ = jax.lax.scan(f, None, jnp.broadcast_to(x, (n//chunk,)+x.shape))
    return out
mm = jax.jit(matmul_only)
timeit("matmul_only(all chunks)", mm, scan, jax.random.PRNGKey(0))
