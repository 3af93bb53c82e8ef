"""Sub-decomposition of the group-layout stage (explicit-arg jits).

The stage probe (profile_stage_multi.py) put group_layout at ~4.8 ms
(spread, 112 groups) / ~6.8 ms (multi, 1120 groups) at 102,400
particles - far above the bandwidth model (~1 ms).  This isolates the
pieces: counting rank, radix passes, the keypad/origins scatters, and
an argsort baseline.

Run: python tests/profile_layout2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from top_down_renderer_tpu.filter import pallas_score as ps

N = int(os.environ.get("BENCH_N", 102400))


def timeit(name, f, *args, reps=20):
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])  # fence (axon early-return)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt * 1000:9.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    for g, p_tile in ((112, 64), (1120, 64)):
        key = jnp.asarray(rng.integers(0, g, N).astype(np.int32))
        vals = jnp.asarray(
            rng.integers(0, 1000, (N, 4)).astype(np.int32)
        )
        print(f"[groups={g} p_tile={p_tile}]")

        timeit("counting_pos(no pad)",
               jax.jit(lambda k: ps._counting_pos(k, g)[0]), key)
        timeit("group_layout(full)",
               jax.jit(lambda k: ps._group_layout(k, g, p_tile)[0]),
               key)

        def layout_scatters(k, v):
            pos, tile_midx, n_pad = ps._group_layout(k, g, p_tile)
            origins = jnp.zeros((n_pad, 4), jnp.int32).at[pos].set(v)
            loc = jnp.zeros((n_pad, 1), jnp.int32).at[pos, 0].set(
                k
            )
            return origins, loc, tile_midx

        timeit("layout+origin/loc scatters",
               jax.jit(layout_scatters), key, vals)

        def layout_packed(k, v):
            pos, tile_midx, n_pad = ps._group_layout(k, g, p_tile)
            row = jnp.concatenate([v, k[:, None]], axis=1)  # (N, 5)
            buf = jnp.zeros((n_pad, 5), jnp.int32).at[pos].set(row)
            return buf[:, :4], buf[:, 4:5], tile_midx

        timeit("layout+packed scatter",
               jax.jit(layout_packed), key, vals)

        timeit("argsort(stable) baseline",
               jax.jit(lambda k: jnp.argsort(k, stable=True)), key)

        pos = jax.jit(lambda k: ps._group_layout(k, g, p_tile)[0])(key)
        timeit("scatter(distinct, (N,4))",
               jax.jit(lambda p, v: jnp.zeros(
                   (int(np.asarray(pos).max()) + 1, 4), jnp.int32
               ).at[p].set(v)), pos, vals)


if __name__ == "__main__":
    main()
