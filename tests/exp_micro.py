"""Clean micro-benchmarks for tail + kernel-build primitives (run with
an otherwise idle host)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax, jax.numpy as jnp
import numpy as np

n = 102400
th = 100
rng = np.random.default_rng(0)
w = jnp.asarray(rng.random(n).astype(np.float32))
w = w / jnp.sum(w)
packed = jnp.asarray(rng.random((n, 8)).astype(np.float32))
j_idx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
shifts = jnp.asarray(rng.integers(0, th, n).astype(np.int32))
alive = jnp.ones(n, bool)


def timeit(name, fn, *args, reps=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:38s} {(time.perf_counter()-t0)/reps*1000:8.3f} ms",
          flush=True)
    return out


timeit("cumsum(102k)", jax.jit(jnp.cumsum), w)
timeit("cummax(102k)", jax.jit(jax.lax.cummax), j_idx)
timeit("scatter_max 102k desc",
       jax.jit(lambda p: jnp.zeros(n, jnp.int32).at[p].max(
           jnp.arange(n, dtype=jnp.int32), mode="drop")), j_idx)
timeit("take rows (102k,8)",
       jax.jit(lambda p, i: jnp.take(p, i, axis=0)), packed, j_idx)
timeit("take flat 102k",
       jax.jit(lambda p, i: p.reshape(-1)[i * 8]), packed, j_idx)
timeit("smask scatter 102k desc",
       jax.jit(lambda s: jnp.zeros(th, bool).at[
           jnp.where(alive, s, th)].max(True, mode="drop")), shifts)
timeit("smask onehot-any (102k,100)",
       jax.jit(lambda s: jnp.any(
           (s[:, None] == jnp.arange(th)[None, :]) & alive[:, None],
           axis=0)), shifts)
timeit("smask bincount-free segsum",
       jax.jit(lambda s: jnp.sum(
           jax.nn.one_hot(s, th, dtype=jnp.float32), axis=0) > 0),
       shifts)

# kernel-build block scatter: 2500 descriptors of (8, 64) blocks
tr = 2500
vals = jnp.asarray(rng.random((tr, 8, 64)).astype(np.float32))
pix = jnp.asarray(rng.integers(0, tr, tr).astype(np.int32))
timeit("block scatter-add 2500x(8,64)",
       jax.jit(lambda v, p: jnp.zeros((2500, 8, 64), jnp.float32)
               .at[p].add(v)), vals, pix)
timeit("block take 2500x(8,64)",
       jax.jit(lambda v, p: jnp.take(v, p, axis=0)), vals, pix)
vals_r = jnp.asarray(rng.random((tr * 8, 64)).astype(np.float32))
pix_r = jnp.asarray(rng.integers(0, tr * 8, tr * 8).astype(np.int32))
timeit("row scatter-add 20000x(64)",
       jax.jit(lambda v, p: jnp.zeros((tr * 8, 64), jnp.float32)
               .at[p].add(v)), vals_r, pix_r)

# postprocess-style fused reductions
def post(w_):
    isnan = jnp.isnan(w_)
    valid = alive & ~isnan
    total = jnp.sum(jnp.where(valid, w_, 0.0))
    nv = jnp.sum(valid.astype(jnp.float32))
    mean = total / jnp.maximum(nv, 1.0)
    under = valid & (w_ < mean)
    nu = jnp.sum(under.astype(jnp.float32))
    bv = jnp.sum(jnp.where(under, (w_ - mean) ** 2, 0.0)) / jnp.maximum(nu, 1)
    out = jnp.where(alive & isnan, mean - jnp.sqrt(bv), w_)
    out = out / jnp.sum(out)
    return out
timeit("postprocess-style reductions", jax.jit(post), w)
