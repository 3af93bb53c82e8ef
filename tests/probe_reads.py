"""Dev probe: per-particle field-read strategies on TPU.

The conv path reads (cost, norm, kf) per particle from the cost field
with three 102k-descriptor single-element gathers; the init flavor
reads 81 consecutive elements per particle.  Times the alternatives.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def timeit(fn, *args, reps=50, warm=2):
    import jax

    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    n = 102400
    s_out = 33
    cells = 17424  # (33*33)*16 folded slots
    rng = np.random.default_rng(0)
    flat = jnp.asarray(
        rng.random(cells * s_out).astype(np.float32)
    )
    base = jnp.asarray(
        rng.integers(0, cells, n).astype(np.int32) * s_out
    )
    local = jnp.asarray(rng.integers(0, 16, n).astype(np.int32))

    @jax.jit
    def three_gathers(flat, base, local):
        cost = flat[base + local]
        norm = flat[base + 16 + local]
        kf = flat[base + 32]
        return cost + norm + kf

    @jax.jit
    def row_then_take(flat, base, local):
        rows = flat.reshape(-1, s_out)[base // s_out]  # (N, 33)
        cost = jnp.take_along_axis(rows, local[:, None], 1)[:, 0]
        norm = jnp.take_along_axis(rows, 16 + local[:, None], 1)[:, 0]
        kf = rows[:, 32]
        return cost + norm + kf

    @jax.jit
    def one_gather_3n(flat, base, local):
        idx = jnp.concatenate(
            [base + local, base + 16 + local, base + 32]
        )
        v = flat[idx]
        return v[:n] + v[n : 2 * n] + v[2 * n :]

    print(f"3 gathers      {timeit(three_gathers, flat, base, local):7.3f} ms")
    print(f"row+take       {timeit(row_then_take, flat, base, local):7.3f} ms")
    print(f"one 3N gather  {timeit(one_gather_3n, flat, base, local):7.3f} ms")

    # init flavor: 81 consecutive values per particle
    s81 = 81
    flat81 = jnp.asarray(
        rng.random(cells * s81).astype(np.float32)
    )
    base81 = jnp.asarray(
        rng.integers(0, cells, n).astype(np.int32) * s81
    )

    @jax.jit
    def init_idx_gather(flat, base):
        idx = base[:, None] + jnp.arange(80)[None, :]
        return flat[idx].sum(1)

    @jax.jit
    def init_row_gather(flat, base):
        rows = flat.reshape(-1, s81)[base // s81]
        return rows[:, :80].sum(1)

    print(f"init idx (N,80) {timeit(init_idx_gather, flat81, base81):7.3f} ms")
    print(f"init row (N,81) {timeit(init_row_gather, flat81, base81):7.3f} ms")


if __name__ == "__main__":
    main()
