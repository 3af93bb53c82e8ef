"""Dev micro-bench: the Pallas crop kernel ALONE at headline scale.

Isolates _run_kernel (crop DMA + lane rotate + M matmul) from the rest
of the spread-regime step so DMA traffic / matmul width / per-tile
overhead changes can be measured directly on hardware.

Knobs: BENCH_N (102400), BENCH_MO (24), BENCH_MODE (tracked|init),
BENCH_PTILE (override p_tile), BENCH_MAP (1024).

Run: python tests/bench_crop_kernel.py  (TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def _fence(out):
    # value-read fence: block_until_ready returns early on axon
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, reps=30, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from top_down_renderer_tpu.filter import pallas_score as ps
    from top_down_renderer_tpu.maps.polar import polar_stencil

    n = int(os.environ.get("BENCH_N", 102400))
    hw = int(os.environ.get("BENCH_MAP", 1024))
    mo = int(os.environ.get("BENCH_MO", 24))
    mode = os.environ.get("BENCH_MODE", "tracked")
    c = 6
    th, r = 100, 25
    rng = np.random.default_rng(0)

    packed = np.zeros((hw, hw, 8), np.float32)
    packed[..., :c] = rng.random((hw, hw, c)) * 50
    packed[..., c] = (rng.random((hw, hw)) < 0.9).astype(np.float32)
    maps = ps.build_padded_maps(jnp.asarray(packed))
    stencil = jnp.asarray(polar_stencil(th, r))
    scan = jnp.asarray((rng.random((c, th, r)) * 3), jnp.float32)
    cw = jnp.ones((c,), jnp.float32)
    f = 1.0

    # spread cloud: centers uniform over the map
    centers = jnp.asarray(
        rng.random((n, 2)) * (hw - 100) + 50, jnp.float32
    )
    thetas = jnp.asarray(rng.random(n) * 2 * np.pi, jnp.float32)

    rxm = ps.I4_RX if maps.i4 else (ps.YF_RX if maps.yf else ps.RX)
    if mode == "tracked":
        p_tile = int(os.environ.get("BENCH_PTILE", ps.tracked_p_tile(mo)))
        s_cols = 64
        m_var = ps.build_m_tracked(
            scan, cw, stencil, f, mo, maps.qinv, yf=maps.yf, i4=maps.i4
        )
        from top_down_renderer_tpu.filter.scoring import rotation_shift

        s = rotation_shift(thetas, th)
        key = (s // ps.GW) * rxm
        n_groups = rxm * ps.N_GROUPS
    else:
        p_tile = int(os.environ.get("BENCH_PTILE", ps.init_p_tile(mo)))
        s_cols = 128
        m_var = ps.build_m_init(
            scan, cw, stencil, f, mo, qinv=maps.qinv, yf=maps.yf,
            i4=maps.i4,
        )
        key = jnp.zeros((n,), jnp.int32)
        n_groups = rxm

    ry, y8, xe, rx, in_range = ps._origins(centers, maps, mo, 1.0)
    key = (key + rx).astype(jnp.int32)
    pos, tile_midx, n_pad = ps._group_layout(key, n_groups, p_tile)
    origins = jnp.zeros((n_pad, 4), jnp.int32)
    origins = origins.at[pos].set(
        jnp.stack([ry, y8, xe, jnp.zeros_like(ry)], axis=-1)
    )
    jax.block_until_ready((origins, m_var))
    n_tiles = n_pad // p_tile
    dr, dc = ps.crop_dims(mo)
    if maps.i4:
        row_b = ps.crop_cols_i4(mo) * 4
    elif maps.yf:
        row_b = ps.crop_cols_yf(mo) * 8
    else:
        row_b = dc * 8
    crop_bytes = dr * row_b
    print(
        f"n={n} mo={mo} mode={mode} p_tile={p_tile} tiles={n_tiles} "
        f"crop={crop_bytes}B dma_total={n_pad * crop_bytes / 2**30:.2f}GiB "
        f"i4={maps.i4}"
    )

    kern = jax.jit(
        lambda o_, mi_, mv_: ps._run_kernel(
            maps.stacked, o_, mi_, mv_, mo, p_tile, s_cols,
            yf=maps.yf, i4=maps.i4,
        )
    )
    t = timeit(kern, origins, tile_midx, m_var, reps=20)
    print(f"kernel {t:8.3f} ms  ({t / n_tiles * 1e3:.2f} us/tile)")

    # full scorer (layout + kernel + reads)
    if mode == "tracked":
        score = jax.jit(
            lambda sc: ps.score_tracked_fast_mo(
                maps, stencil, sc, cw, centers, thetas, f, mo
            )
        )
    else:
        score = jax.jit(
            lambda sc: ps.score_init_fast_mo(
                maps, stencil, sc, cw, centers, f, mo
            )
        )
    t2 = timeit(score, scan, reps=20)
    print(f"score  {t2:8.3f} ms")


if __name__ == "__main__":
    main()
