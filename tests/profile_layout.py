"""Micro-probe: _group_layout cost structure + alternatives (real TPU).

group_layout measured ~4.9 ms standalone at 102,400 particles. Times
the argsort itself, the packed single-array sort alternative, and a
counting-rank formulation (one-hot cumsum), to pick a cheaper stable
grouping for the crop kernel's tile layout.

Run: python tests/profile_layout.py  [TDR_LAYOUT_GROUPS=112]
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
G = int(os.environ.get("TDR_LAYOUT_GROUPS", 112))
P_TILE = 64


def timeit(name, f, *args, reps=10):
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    print(f"{name:28s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms")


def rank_counting(key, n_groups):
    """rank_i = #{j<i : key_j == key_i} via blocked one-hot cumsum."""
    n = key.shape[0]
    nb = 512
    b = n // nb
    oh = (key.reshape(b, nb)[..., None]
          == jnp.arange(n_groups, dtype=key.dtype)).astype(jnp.int32)
    within = jnp.cumsum(oh, axis=1) - oh  # exclusive, in-block
    block_tot = jnp.sum(oh, axis=1)  # (b, G)
    block_off = jnp.cumsum(block_tot, axis=0) - block_tot  # (b, G)
    rank2d = within + block_off[:, None, :]
    rank = jnp.sum(rank2d * oh, axis=-1).reshape(n)
    return rank


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, G, N), jnp.int32)

    timeit("argsort(stable)",
           jax.jit(lambda k: jnp.argsort(k, stable=True)), key)
    timeit(
        "packed f32 sort",
        jax.jit(
            lambda k: jnp.sort(
                (k.astype(jnp.float32) * (2.0 ** 18))
                + jnp.arange(N, dtype=jnp.float32)
            )
        ),
        key,
    )
    timeit("rank_counting",
           jax.jit(lambda k: rank_counting(k, G)), key)
    timeit("group_layout(current)",
           jax.jit(lambda k: ps._group_layout(k, G, P_TILE)[:2]), key)

    # counting-rank full layout: pos + tile keys without any sort
    def layout_counting(k):
        counts = jnp.sum(
            (k[:, None] == jnp.arange(G, dtype=k.dtype)).astype(
                jnp.int32
            ),
            axis=0,
        )
        padded = jnp.where(
            counts > 0, ((counts + P_TILE - 1) // P_TILE) * P_TILE, 0
        )
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(padded)[:-1].astype(jnp.int32)]
        )
        rank = rank_counting(k, G)
        pos = starts[k] + rank
        n_pad = ((N + P_TILE - 1) // P_TILE + G) * P_TILE
        keypad = jnp.full(n_pad, -1, jnp.int32).at[pos].set(k)
        tile_key = jnp.max(keypad.reshape(n_pad // P_TILE, P_TILE), 1)
        return pos, tile_key

    timeit("layout_counting", jax.jit(layout_counting), key)

    # parity check
    pos_a, tk_a, _ = ps._group_layout(key, G, P_TILE)
    pos_b, tk_b = layout_counting(key)
    assert np.array_equal(np.asarray(pos_a), np.asarray(pos_b))
    assert np.array_equal(np.asarray(tk_a), np.asarray(tk_b))
    print("layout parity OK")


if __name__ == "__main__":
    main()
