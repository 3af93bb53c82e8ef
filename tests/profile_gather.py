"""Measure XLA TPU gather variants for the stencil gather."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
import jax, jax.numpy as jnp
import numpy as np

H = W = 1024
CP = 8
N = 102400
S = 2500
CHUNK = int(os.environ.get("BENCH_CHUNK", 4096))
rng = np.random.default_rng(0)
pk32 = jnp.asarray(rng.random((H, W, CP)), jnp.float32)
pk16 = pk32.astype(jnp.bfloat16)
lin = jnp.asarray(rng.integers(0, H * W, (N, S)), jnp.int32)
iy = lin // W
ix = lin % W

def timeit(name, f, *args, reps=3):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1000:9.1f} ms", flush=True)

def chunked(f, idx_args):
    def g(*args):
        def cf(a):
            return f(*a)
        chunks = tuple(a.reshape(-1, CHUNK, *a.shape[1:]) for a in args)
        return jax.lax.map(cf, chunks)
    return g

# 1) baseline: take rows from (H*W, 8) f32, reduce
f1 = jax.jit(chunked(lambda l: jnp.sum(jnp.take(pk32.reshape(-1, CP), l, axis=0), axis=(1, 2)), 1))
timeit("take (HW,8) f32", f1, lin)

# 2) same, bf16
f2 = jax.jit(chunked(lambda l: jnp.sum(jnp.take(pk16.reshape(-1, CP), l, axis=0).astype(jnp.float32), axis=(1, 2)), 1))
timeit("take (HW,8) bf16", f2, lin)

# 3) per-channel 1D takes f32
flat32 = pk32.reshape(-1, CP)
def ch_take(l):
    acc = 0
    for c in range(CP):
        acc = acc + jnp.sum(jnp.take(flat32[:, c], l, axis=0), axis=1)
    return acc
f3 = jax.jit(chunked(ch_take, 1))
timeit("per-channel 1D take f32 x8", f3, lin)

# 4) single-channel 1D take f32 (volume 1/8)
f4 = jax.jit(chunked(lambda l: jnp.sum(jnp.take(flat32[:, 0], l, axis=0), axis=1), 1))
timeit("single-channel 1D take f32", f4, lin)

# 5) 2D advanced indexing [iy, ix] f32
f5 = jax.jit(chunked(lambda y, x: jnp.sum(pk32[y, x], axis=(1, 2)), 2))
timeit("2D index [iy,ix] (.,8) f32", f5, iy, ix)

# 6) sorted indices within chunk
lin_sorted = jnp.sort(lin, axis=1)
timeit("take (HW,8) f32 sorted-idx", f1, lin_sorted)

# 7) one dynamic_slice row-crop per particle (D=64), vmapped
D = 64
y0 = jnp.clip(iy[:, 0], 0, H - D)
x0 = jnp.clip(ix[:, 0], 0, W - D)
def crop_sum(y, x):
    c = jax.lax.dynamic_slice(pk16, (y, x, 0), (D, D, CP))
    return jnp.sum(c.astype(jnp.float32))
f7 = jax.jit(chunked(lambda y, x: jax.vmap(crop_sum)(y, x), 2))
timeit(f"vmap dynamic_slice {D}x{D}x8 bf16", f7, y0, x0)
