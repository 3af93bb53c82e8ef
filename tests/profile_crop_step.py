"""Decompose the spread-regime crop step on the real TPU.

The r4 ablation (exp_crop_ablate, honest fencing) puts the trimmed
kernel at ~12.2 ms while the full spread_tracked step measures ~23.7 ms
at 102,400 particles - this probe splits the remaining ~11.5 ms into
M build / quantization / group layout / tail so the next optimization
targets the real cost.

Run: python tests/profile_crop_step.py       (tracked)
     BENCH_MODE=init python tests/profile_crop_step.py
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

import __graft_entry__ as ge
from top_down_renderer_tpu.config import FilterParams
from top_down_renderer_tpu.filter import pallas_score as ps
from top_down_renderer_tpu.filter.filter import (
    make_update_step_fast,
    make_tail_fn,
    weight_from_cost,
)
from top_down_renderer_tpu.filter.scoring import rotation_shift

N = int(os.environ.get("BENCH_N", 102400))
HW = int(os.environ.get("BENCH_MAP", 1024))
MODE = os.environ.get("BENCH_MODE", "tracked")
C = 6
TH, R = 100, 25
SCALE, RES = 2.0, 0.5  # f = 1.0 -> mo 24


def timeit(name, f, *args, reps=10):
    # fence with a device-side scalar read: np.asarray(leaf) would pull
    # the whole output over the axon tunnel (a 64 MB M table read as
    # ~170 ms of phantom "compute"); see tests/profile_stage_multi.py
    # for the explicit-arg staged version of this probe
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])  # fence (axon early-return)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1000:9.2f} ms")
    return dt


def main():
    (state, packed, map_size, stencil, scan, res, _p) = (
        ge._synthetic_setup(
            N, h=HW, w=HW, c=C, theta_bins=TH, range_bins=R,
            cluster=None, theta_spread=None,
        )
    )
    state = state.replace(
        particles=state.particles.replace(
            scale=jnp.full((N,), SCALE, jnp.float32)
        )
    )
    res = jnp.asarray(RES, jnp.float32)
    params = FilterParams(
        fixed_scale=SCALE, class_weights=[1.0] * C, force_on_map=True
    )
    mo = ps.pick_crop_size(SCALE * RES, R)
    maps = ps.build_padded_maps(packed)
    cw = jnp.ones(C, jnp.float32)
    update = make_update_step_fast(
        params, grid_num_classes=C, map_resolution=1.0, theta_bins=TH,
        n_max=N, mode=MODE, mo=mo, gmm_every=10, path="crop",
    )
    p = state.particles
    f = SCALE * RES

    # 1. whole step (score + tail dispatches, what bench.py times)
    step = lambda: update(state, maps, map_size, stencil, scan, res)
    timeit("step_total", step)

    # 2. scorer end to end
    if MODE == "tracked":
        scorer = jax.jit(
            lambda: ps.score_tracked_fast_mo(
                maps, stencil, scan, cw, p.pose_px(), p.theta, f, mo
            )
        )
    else:
        scorer = jax.jit(
            lambda: ps.score_init_sel_mo(
                maps, stencil, scan, cw, p.pose_px(), f, mo
            )
        )
    timeit("scorer_total", scorer)

    # 3. M build alone
    if MODE == "tracked":
        build = jax.jit(
            lambda: ps.build_m_tracked(scan, cw, stencil, f, mo,
                                       maps.qinv)
        )
    else:
        build = jax.jit(
            lambda: ps.build_m_init(scan, cw, stencil, f, mo, 40,
                                    maps.qinv)
        )
    m_var = build()
    timeit("m_build", build)

    # 4. hi/lo quantization (the _run_kernel pre-kernel math; M is
    # already built trimmed at the source since r4 commit 1738b3b)
    def quant(m_var):
        n_var, s_m = m_var.shape[0], m_var.shape[1]
        m32 = m_var.astype(jnp.float32)
        amax = jnp.max(jnp.abs(m32), axis=-1)
        s_hi = jnp.maximum(amax, 1e-30) / 127.0
        hi = jnp.clip(jnp.round(m32 / s_hi[..., None]), -127, 127)
        rr = m32 - hi * s_hi[..., None]
        s_lo = s_hi / 254.0
        lo = jnp.clip(jnp.round(rr / s_lo[..., None]), -127, 127)
        m_i8 = jnp.concatenate([hi, lo], axis=1).astype(jnp.int8)
        m_scale = jnp.concatenate([s_hi, s_lo], axis=1)[:, None, :]
        return m_i8, m_scale

    timeit("m_quant(trim+hi/lo)", jax.jit(quant), m_var)

    # 5. group layout + origin/locals scatters
    def layout():
        ry, y8, xe, rx, in_range = ps._origins(p.pose_px(), maps, mo,
                                               1.0)
        if MODE == "tracked":
            s = rotation_shift(p.theta, TH)
            g = s // ps.GW
            key = (g * ps.RX + rx).astype(jnp.int32)
            pos, tile_midx, n_pad = ps._group_layout(
                key, ps.RX * ps.N_GROUPS, ps.tracked_p_tile(mo)
            )
            local = s - g * ps.GW
            loc = jnp.zeros((n_pad, 1), jnp.int32).at[pos, 0].set(local)
        else:
            pos, tile_midx, n_pad = ps._group_layout(
                rx.astype(jnp.int32), ps.RX, ps.init_p_tile(mo)
            )
            loc = None
        origins = jnp.zeros((n_pad, 4), jnp.int32).at[pos].set(
            jnp.stack([ry, y8, xe, jnp.zeros_like(ry)], axis=-1)
        )
        return pos, tile_midx, origins, loc

    timeit("group_layout", jax.jit(layout))

    # 6. tail: weights + resample/stats/gmm
    tail = make_tail_fn(params, N, 8, 10, TH)
    cost = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (N,)))
    timeit(
        "tail(weights+resample)",
        lambda: tail(state, cost, p.theta, map_size),
    )


if __name__ == "__main__":
    main()
