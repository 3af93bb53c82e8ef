"""Dev probe: per-stage timing of the unknown-scale multi-tracked step.

Measured 154 ms/step at 102,400 particles / K=10 buckets - this breaks
it into: M-variant build, bucket assignment + origins, group layout
(argsort), the crop kernel, the per-particle reads, and the tail.

Run: python tests/profile_multi.py  (TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from profile_headline import timeit


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from top_down_renderer_tpu.config import FilterParams
    from top_down_renderer_tpu.filter import multiscale as ms
    from top_down_renderer_tpu.filter import pallas_score as ps
    from top_down_renderer_tpu.filter.filter import _pad_class_weights
    from top_down_renderer_tpu.filter.scoring import rotation_shift

    n = int(os.environ.get("BENCH_N", 102400))
    hw = 1024
    c = 6
    theta_bins, range_bins = 100, 25
    res_v = 0.5
    mo = ms.MO_MULTI

    (state, packed, map_size, stencil, scan, res, _p) = (
        ge._synthetic_setup(n, h=hw, w=hw, c=c)
    )
    hyp = (10.0 ** (np.arange(10) / 10.0)).astype(np.float32)
    scale = jnp.asarray(hyp[np.arange(n) % 10])
    theta = state.particles.theta
    center = state.particles.pose_px()
    params = FilterParams(fixed_scale=-1.0, class_weights=[1.0] * c)
    cw = _pad_class_weights(params, c)
    mips = tuple(ms.mip_for_f(float(s) * res_v) for s in hyp)
    levels = tuple(sorted(set(mips)))
    bmi = tuple(levels.index(m) for m in mips)
    pyr = ms.build_pyramid_maps(packed, levels)
    slots = jnp.asarray(hyp)
    res_j = jnp.asarray(res_v, jnp.float32)
    mips_j = jnp.asarray([pyr.mips[i] for i in bmi], jnp.float32)
    print(f"n={n} K=10 levels={levels} mo={mo}")

    # --- M build ---
    build = jax.jit(
        lambda sc, f_eff: ms.build_m_tracked_multi(
            sc, cw, stencil, f_eff, mo
        )
    )
    f_eff = slots * res_j / mips_j
    t_build = timeit(build, scan, f_eff, reps=10)
    m_var = build(scan, f_eff)
    print(f"m_var {m_var.shape} = "
          f"{m_var.size * 2 / 2**30:.2f} GiB")

    # --- assignment + origins ---
    ao = jax.jit(
        lambda s_, c_: ms._origins_pyramid(
            c_, ms.assign_buckets(s_, slots), pyr, bmi, mo, 1.0
        )
    )
    t_ao = timeit(ao, scale, center, reps=10)

    # --- group layout (argsort) ---
    bucket = ms.assign_buckets(scale, slots)
    ry, y8, xe, rx, in_range = ao(scale, center)
    p_tile = ps.tracked_p_tile(mo)
    s = rotation_shift(theta, theta_bins)
    g = s // ps.GW
    key = ((bucket * ps.N_GROUPS + g) * ps.RX + rx).astype(jnp.int32)
    gl = jax.jit(
        lambda k_: ps._group_layout(k_, 10 * ps.RX * ps.N_GROUPS,
                                    p_tile)[:2]
    )
    t_gl = timeit(gl, key, reps=10)
    pos, tile_midx, n_pad = ps._group_layout(
        key, 10 * ps.RX * ps.N_GROUPS, p_tile
    )
    print(f"n_pad {n_pad} tiles {n_pad // p_tile}")
    origins = jnp.zeros((n_pad, 4), jnp.int32)
    origins = origins.at[pos].set(
        jnp.stack([ry, y8, xe, jnp.zeros_like(ry)], axis=-1)
    )

    # --- kernel (sel mode, as the tracked scorer runs it) ---
    local = s - g * ps.GW
    loc_pad = jnp.zeros((n_pad, 1), jnp.int32).at[pos, 0].set(local)
    kern = jax.jit(
        lambda o_, mi_, mv_, l_: ps._run_kernel(
            pyr.stacked, o_, mi_, mv_, mo, p_tile, 64, False,
            sel=True, locals_=l_,
        )
    )
    t_kern = timeit(kern, origins, tile_midx, m_var, loc_pad, reps=10)
    out = kern(origins, tile_midx, m_var, loc_pad)

    # --- reads (distinct-slot scatter readback) ---
    def reads(o_, pos_):
        inv = jnp.full((n_pad,), n, jnp.int32).at[pos_].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        z = jnp.zeros(n, jnp.float32)
        return (z.at[inv].set(o_[:, 0], mode="drop"),
                z.at[inv].set(o_[:, 1], mode="drop"),
                z.at[inv].set(o_[:, 2], mode="drop"))

    t_reads = timeit(jax.jit(reads), out, pos, reps=10)

    # --- full score fn (as the dispatch runs it) ---
    score = ms.make_score_tracked_multi(10, bmi, 1.0)
    sj = jax.jit(
        lambda sc: score(pyr, stencil, sc, cw, center, theta, scale,
                         slots, res_j)
    )
    t_score = timeit(sj, scan, reps=10)

    print(f"build  {t_build:8.3f} ms")
    print(f"assign {t_ao:8.3f} ms")
    print(f"layout {t_gl:8.3f} ms")
    print(f"kernel {t_kern:8.3f} ms")
    print(f"reads  {t_reads:8.3f} ms")
    print(f"score  {t_score:8.3f} ms (all of the above fused)")


if __name__ == "__main__":
    main()
