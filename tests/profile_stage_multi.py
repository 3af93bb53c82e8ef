"""Stage-timed decomposition of the spread-tracked and multi-tracked
crop steps with EXPLICIT-ARG jits.

profile_crop_step.py timed no-arg jit closures; on the axon backend a
closure-captured 64 MB M table is re-materialized per dispatch, which
inflated m_build to 126 ms inside a 24.5 ms step.  Here every stage is
a jit over explicit device-array arguments, so the timings reflect the
in-graph cost the fused step actually pays.

Run: python tests/profile_stage_multi.py            (both regimes)
     STAGE_REGIME=spread|multi python tests/profile_stage_multi.py
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
from top_down_renderer_tpu.filter import multiscale as msc
from top_down_renderer_tpu.filter import pallas_score as ps
from top_down_renderer_tpu.filter.scoring import rotation_shift

N = int(os.environ.get("BENCH_N", 102400))
HW = int(os.environ.get("BENCH_MAP", 1024))
C = 6
TH, R = 100, 25
SCALE, RES = 2.0, 0.5


def fence(out):
    # device-side index + scalar transfer: np.asarray(leaf) would pull
    # the WHOLE array over the axon tunnel (a 321 MB M table reads as
    # 2.3 s of "compute")
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])


def timeit(name, f, *args, reps=10):
    out = f(*args)
    fence(out)  # axon block_until_ready early-return workaround
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def quant_hilo(m_var, mo):
    """The _run_kernel hi/lo int8 quant, stage-isolated (the builders
    emit the trimmed dr*t layout directly since round 4)."""
    dr, dc = ps.crop_dims(mo)
    t = ps.trim_lanes(mo)
    n_var, s_m = m_var.shape[0], m_var.shape[1]
    if m_var.shape[2] == dr * dc * ps.C_PAD and t < dc * ps.C_PAD:
        m_var = m_var.reshape(n_var, s_m, dr, dc * ps.C_PAD)[
            ..., :t
        ].reshape(n_var, s_m, dr * t)
    m32 = m_var.astype(jnp.float32)
    amax = jnp.max(jnp.abs(m32), axis=-1)
    s_hi = jnp.maximum(amax, 1e-30) / 127.0
    hi = jnp.clip(jnp.round(m32 / s_hi[..., None]), -127, 127)
    res = m32 - hi * s_hi[..., None]
    s_lo = s_hi / 254.0
    lo = jnp.clip(jnp.round(res / s_lo[..., None]), -127, 127)
    m_i8 = jnp.concatenate([hi, lo], axis=1).astype(jnp.int8)
    m_scale = jnp.concatenate([s_hi, s_lo], axis=1)[:, None, :]
    return m_i8, m_scale


def spread(state, packed, stencil, scan):
    mo = ps.pick_crop_size(SCALE * RES, R)
    maps = ps.build_padded_maps(packed)
    cw = jnp.ones(C, jnp.float32)
    p = state.particles
    f = SCALE * RES
    p_tile = ps.tracked_p_tile(mo)
    print(f"[spread tracked] mo={mo} p_tile={p_tile}")

    scorer = jax.jit(
        lambda mp, sten, sc, w, cpx, th: ps.score_tracked_fast_mo(
            mp, sten, sc, w, cpx, th, f, mo
        )
    )
    timeit("scorer_total", scorer, maps, stencil, scan, cw,
           p.pose_px(), p.theta)

    build = jax.jit(
        lambda sc, w, sten, qi: ps.build_m_tracked(sc, w, sten, f, mo, qi)
    )
    m_var = build(scan, cw, stencil, maps.qinv)
    timeit("m_build", build, scan, cw, stencil, maps.qinv)

    timeit("m_quant(trim+hi/lo)",
           jax.jit(lambda m: quant_hilo(m, mo)), m_var)
    timeit(
        "m_build+quant(fused)",
        jax.jit(lambda sc, w, sten, qi: quant_hilo(
            ps.build_m_tracked(sc, w, sten, f, mo, qi), mo
        )),
        scan, cw, stencil, maps.qinv,
    )

    def layout(cpx, theta):
        ry, y8, xe, rx, in_range = ps._origins(cpx, maps, mo, 1.0)
        s = rotation_shift(theta, TH)
        g = s // ps.GW
        key = (g * ps.RX + rx).astype(jnp.int32)
        pos, tile_midx, n_pad = ps._group_layout(
            key, ps.RX * ps.N_GROUPS, p_tile
        )
        local = s - g * ps.GW
        loc = jnp.zeros((n_pad, 1), jnp.int32).at[pos, 0].set(local)
        origins = jnp.zeros((n_pad, 4), jnp.int32).at[pos].set(
            jnp.stack([ry, y8, xe, jnp.zeros_like(ry)], axis=-1)
        )
        return pos, tile_midx, origins, loc

    out = jax.jit(layout)(p.pose_px(), p.theta)
    tk = np.asarray(out[1])
    print(f"  n_pad={out[2].shape[0]} live_tiles={(tk >= 0).sum()}"
          f"/{tk.size}")
    timeit("group_layout", jax.jit(layout), p.pose_px(), p.theta)


def multi(state, packed, stencil, scan):
    mo = msc.multi_mo()
    hyp = (10.0 ** (np.arange(10) / 10.0)).astype(np.float32)
    scale = jnp.asarray(hyp[np.arange(N) % 10])
    mips = tuple(msc.mip_for_f(float(s) * RES) for s in hyp)
    levels = tuple(sorted(set(mips)))
    bmi = tuple(levels.index(m) for m in mips)
    pyr = msc.build_pyramid_maps(packed, levels)
    cw = jnp.ones(C, jnp.float32)
    p = state.particles
    slots = jnp.asarray(hyp)
    res = jnp.asarray(RES, jnp.float32)
    k = len(hyp)
    p_tile = ps.tracked_p_tile(mo)
    print(f"[multi tracked] k={k} mips={levels} mo={mo} p_tile={p_tile}"
          f" groups={k * ps.N_GROUPS * ps.RX}")

    sc_fn = msc.make_score_tracked_multi(k, bmi, 1.0, False, mo)
    scorer = jax.jit(
        lambda py, sten, sc, w, cpx, th, s, sl, r: sc_fn(
            py, sten, sc, w, cpx, th, s, sl, r
        )
    )
    timeit("scorer_total", scorer, pyr, stencil, scan, cw, p.pose_px(),
           p.theta, scale, slots, res)

    mips_j = jnp.asarray([levels[i] for i in bmi], jnp.float32)

    def build(sc, w, sten, sl, qi):
        f_eff = sl * res / mips_j
        return msc.build_m_tracked_multi(sc, w, sten, f_eff, mo, qi,
                                         with_amax=True)

    m_var, m_amax = jax.jit(build)(scan, cw, stencil, slots, pyr.qinv)
    print(f"  m_var {m_var.shape} {m_var.dtype}"
          f" = {m_var.size * m_var.dtype.itemsize / 1e6:.0f} MB")
    timeit("m_build(+amax)", jax.jit(build), scan, cw, stencil, slots,
           pyr.qinv)

    timeit("m_quant(hi/lo, amax given)",
           jax.jit(lambda m: quant_hilo(m, mo)), m_var)
    timeit(
        "m_build+quant(fused)",
        jax.jit(lambda sc, w, sten, sl, qi: quant_hilo(
            build(sc, w, sten, sl, qi)[0], mo
        )),
        scan, cw, stencil, slots, pyr.qinv,
    )

    def layout(cpx, theta, s, sl):
        bucket = msc.assign_buckets(s, sl)
        se = rotation_shift(theta, TH)
        g = se // ps.GW
        ry, y8, xe, rx, in_range = msc._origins_pyramid(
            cpx, bucket, pyr, bmi, mo, 1.0
        )
        key = ((bucket * ps.N_GROUPS + g) * ps.RX + rx).astype(jnp.int32)
        pos, tile_midx, n_pad = ps._group_layout(
            key, k * ps.RX * ps.N_GROUPS, p_tile
        )
        local = se - g * ps.GW
        loc = jnp.zeros((n_pad, 1), jnp.int32).at[pos, 0].set(local)
        origins = jnp.zeros((n_pad, 4), jnp.int32).at[pos].set(
            jnp.stack([ry, y8, xe, jnp.zeros_like(ry)], axis=-1)
        )
        return pos, tile_midx, origins, loc

    out = jax.jit(layout)(p.pose_px(), p.theta, scale, slots)
    tk = np.asarray(out[1])
    print(f"  n_pad={out[2].shape[0]} live_tiles={(tk >= 0).sum()}"
          f"/{tk.size}")
    timeit("group_layout", jax.jit(layout), p.pose_px(), p.theta,
           scale, slots)

    # ---- build sub-stages: where do the build's 10+ ms go? ----------
    from top_down_renderer_tpu.filter.scoring import build_circulants

    f_eff = np.asarray(slots) * RES  # host mips applied below
    mips_h = np.asarray([levels[i] for i in bmi], np.float32)
    f_eff = jnp.asarray(f_eff / mips_h)
    dr, dc = ps.crop_dims(mo)
    t = ps.trim_lanes(mo)

    def sub_pix(sc, w, sten):
        cost_circ, norm_circ = build_circulants(sc, w)
        cost_circ = cost_circ.reshape(TH * R * C, TH)
        cols = (
            jnp.arange(ps.N_GROUPS)[:, None] * ps.GW
            + jnp.arange(ps.GW)[None, :]
        ) % TH
        ccs = jnp.moveaxis(cost_circ[:, cols], 1, 0)
        ncs = jnp.moveaxis(norm_circ[:, cols], 1, 0)
        return ccs, ncs

    ccs, ncs = jax.jit(sub_pix)(scan, cw, stencil)
    timeit("  b:circulants+cols", jax.jit(sub_pix), scan, cw, stencil)

    def sub_y(sc, w, sten, fe, qi):
        """matmul only: per-bucket vmapped _build_base_y (no final
        (C_PAD, s, slots)->(s, slots*C_PAD) relayout, no bf16 cast)."""
        ccs2, ncs2 = sub_pix(sc, w, sten)

        def one(f):
            py, px = ps._stencil_pix(sten, f, mo)
            pix8 = py * t + px * ps.C_PAD
            return jax.vmap(
                lambda cc, nc: ps._build_base_y_from_pix(
                    pix8, dr * t, C, cc, nc, 2 * ps.GW + 2, qi
                )
            )(ccs2, ncs2)

        return jax.vmap(one)(fe)

    timeit("  b:y matmul(no relayout)", jax.jit(sub_y), scan, cw,
           stencil, f_eff, pyr.qinv)

    def sub_full(sc, w, sten, fe, qi):
        return msc.build_m_tracked_multi(sc, w, sten, fe, mo, qi)

    timeit("  b:full build(relayout)", jax.jit(sub_full), scan, cw,
           stencil, f_eff, pyr.qinv)

    # quant sub-stages on the built table
    def q_nopad(m):
        m32 = m.astype(jnp.float32)
        amax = jnp.max(jnp.abs(m32), axis=-1)
        s_hi = jnp.maximum(amax, 1e-30) / 127.0
        hi = jnp.clip(jnp.round(m32 / s_hi[..., None]), -127, 127)
        s_lo = s_hi / 254.0
        lo = jnp.clip(
            jnp.round((m32 - hi * s_hi[..., None]) / s_lo[..., None]),
            -127, 127,
        )
        return (
            jnp.concatenate(
                [hi.astype(jnp.int8), lo.astype(jnp.int8)], axis=1
            ),
            jnp.concatenate([s_hi, s_lo], axis=1),
        )

    timeit("  q:hi/lo no-pad", jax.jit(q_nopad), m_var)

    def q_amax(m):
        return jnp.max(jnp.abs(m.astype(jnp.float32)), axis=-1)

    timeit("  q:amax only", jax.jit(q_amax), m_var)

    # ---- layout sub-stages ------------------------------------------
    def lay_origins(cpx, s2, sl):
        bucket = msc.assign_buckets(s2, sl)
        return msc._origins_pyramid(cpx, bucket, pyr, bmi, mo, 1.0)

    timeit("  l:assign+origins", jax.jit(lay_origins), p.pose_px(),
           scale, slots)

    def lay_group(cpx, theta, s2, sl):
        bucket = msc.assign_buckets(s2, sl)
        se = rotation_shift(theta, TH)
        g = se // ps.GW
        key = ((bucket * ps.N_GROUPS + g) * ps.RX
               + jnp.zeros_like(bucket)).astype(jnp.int32)
        return ps._group_layout(key, k * ps.RX * ps.N_GROUPS, p_tile)

    timeit("  l:group_layout(radix)", jax.jit(lay_group), p.pose_px(),
           p.theta, scale, slots)

    def lay_scatters(pos, ry, y8, xe, local):
        n_pad2 = 174080
        loc = jnp.zeros((n_pad2, 1), jnp.int32).at[pos, 0].set(local)
        origins = jnp.zeros((n_pad2, 4), jnp.int32).at[pos].set(
            jnp.stack([ry, y8, xe, jnp.zeros_like(ry)], axis=-1)
        )
        return loc, origins

    se_h = jax.jit(lambda th2: rotation_shift(th2, TH))(p.theta)
    oo = jax.jit(lay_origins)(p.pose_px(), scale, slots)
    timeit("  l:scatters", jax.jit(lay_scatters), out[0], oo[0], oo[1],
           oo[2], se_h % ps.GW)

    # ---- kernel standalone (quant included: m_var is bf16) ----------
    pos_j, tile_midx, origins_j, loc_j = out
    fn = jax.jit(
        lambda og, tm, mv, lp, am: ps._run_kernel(
            pyr.stacked, og, tm, mv, mo, p_tile, 64, False,
            sel=True, locals_=lp, lokf=not ps.m_hilo(),
            kf_col=2 * ps.GW, amax=am,
        )
    )
    timeit("kernel(+quant, amax given)", fn, origins_j, tile_midx,
           m_var, loc_j, m_amax)


def main():
    (state, packed, map_size, stencil, scan, res, _p) = (
        ge._synthetic_setup(
            N, h=HW, w=HW, c=C, theta_bins=TH, range_bins=R,
            cluster=None, theta_spread=None,
        )
    )
    which = os.environ.get("STAGE_REGIME", "both")
    if which in ("both", "spread"):
        spread(state, packed, stencil, scan)
    if which in ("both", "multi"):
        multi(state, packed, stencil, scan)


if __name__ == "__main__":
    main()
