"""Ablation bench for the crop kernel: which stage costs what.

Clones _run_kernel at mo=24/tracked shapes with stages knocked out:
  full      - DMA + roll + int8 matmul (the real kernel)
  no_roll   - DMA + matmul (rx treated as 0)
  no_mm     - DMA + roll, matmul replaced by a 128-lane slice copy
  dma_only  - DMA + slice copy
  mm_only   - roll + matmul on a VMEM-resident garbage crop (no DMA)

Run: python tests/exp_crop_ablate.py  (TPU)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from top_down_renderer_tpu.filter import pallas_score as ps

MO = int(os.environ.get("ABL_MO", "24"))
P_TILE = int(os.environ.get("ABL_P_TILE", "64"))
S_COLS = int(os.environ.get("ABL_S_COLS", "64"))  # 64 tracked / 128 init
N = int(os.environ.get("ABL_N", "102400"))
HW = 1024
ONLY = os.environ.get("ABL_ONLY", "")  # comma list of ablation names
UNROLL = int(os.environ.get("ABL_UNROLL", "0"))  # 0 = full unroll


def _kernel(
    midx_ref, origins_ref, origins_next_ref, stacked_ref, m_hbm_ref,
    m_scale_ref, out_ref, crop_buf, m_buf, prev_idx, m_sem, sems,
    *, mo, p_tile, s_cols, dma, roll, mm, mt=False, flat_only=False,
    trim=0,
):
    dr, dc = ps.crop_dims(mo)
    dc8 = dc * 8
    i_tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    key_t = midx_ref[i_tile]
    key_c = jnp.maximum(key_t, 0)
    midx = key_c // ps.RX
    rx8 = jax.lax.rem(key_c, ps.RX) * 8
    slot = jax.lax.rem(i_tile, 2)
    nslot = jax.lax.rem(i_tile + 1, 2)

    need_m = (i_tile == 0) | (midx != prev_idx[0])

    @pl.when(need_m)
    def _():
        pltpu.make_async_copy(m_hbm_ref.at[midx], m_buf, m_sem).start()

    def dma_fn(orig, i, s):
        return pltpu.make_async_copy(
            stacked_ref.at[
                orig[i, 0],
                pl.ds(orig[i, 1] * 8, dr),
                pl.ds(orig[i, 2] * 128, dc8),
            ],
            crop_buf.at[s, i],
            sems.at[s],
        )

    unroll = UNROLL if UNROLL else True
    if dma:
        @pl.when(i_tile == 0)
        def _():
            jax.lax.fori_loop(
                0, p_tile,
                lambda i, _: (dma_fn(origins_ref, i, slot).start(), 0)[1],
                0, unroll=unroll,
            )

        @pl.when(i_tile + 1 < n_tiles)
        def _():
            jax.lax.fori_loop(
                0, p_tile,
                lambda i, _: (dma_fn(origins_next_ref, i, nslot).start(), 0)[1],
                0, unroll=unroll,
            )

    @pl.when(need_m)
    def _():
        pltpu.make_async_copy(m_hbm_ref.at[midx], m_buf, m_sem).wait()

    prev_idx[0] = midx

    if dma:
        pltpu.make_async_copy(
            crop_buf.at[slot], crop_buf.at[slot], sems.at[slot]
        ).wait()

    if roll:
        ci = pltpu.bitcast(crop_buf[slot], jnp.int32)
        rolled = pltpu.bitcast(
            pltpu.roll(ci, jax.lax.rem(dc8 - rx8, dc8), 2), jnp.int8
        )
    else:
        rolled = crop_buf[slot]
    if flat_only:
        flat = rolled.reshape(p_tile, dr * dc8)
        out_ref[...] = (
            flat[:, :s_cols].astype(jnp.float32)
            * m_scale_ref[0, 0, :s_cols]
        )
    elif mm:
        if trim:
            # post-roll valid px support is [ (dc-16)//2 - mo,
            # (dc-16)//2 + mo ] = 49 px at mo=24; the first 512 lanes
            # (64 px) cover it with a 128-aligned static slice
            rolled = rolled[:, :, :trim]
        flat = rolled.reshape(p_tile, dr * trim if trim else dr * dc8)
        if mm == "bf16":
            # single bf16 plane, s_cols output columns: tests whether
            # the dot is col-tile-streaming-bound (if so this matches
            # the int8 hi/lo dot for 64-col tracked and halves the
            # 256-col init)
            acc = jax.lax.dot_general(
                flat.astype(jnp.bfloat16), m_buf[...],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[...] = acc[:, :s_cols] * m_scale_ref[0, :, :s_cols]
            return
        if mm == "mixed":
            # int8 LHS x bf16 RHS: does Mosaic convert at stream time?
            acc = jax.lax.dot_general(
                flat, m_buf[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[...] = acc[:, :s_cols] * m_scale_ref[0, :, :s_cols]
            return
        if mt:
            acc = jax.lax.dot_general(
                flat, m_buf[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            acc = jax.lax.dot_general(
                flat, m_buf[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        sc = acc.astype(jnp.float32) * m_scale_ref[0]
        out_ref[...] = sc[:, :s_cols] + sc[:, s_cols:]
    else:
        out_ref[...] = (
            rolled[:, 0, :s_cols].astype(jnp.float32)
            * m_scale_ref[0, 0, :s_cols]
        )


def build(stacked, origins, midx, m_i8, m_scale, *, dma, roll, mm,
          mt=False, flat_only=False, trim=0):
    n_pad = origins.shape[0]
    n_tiles = n_pad // P_TILE
    dr, dc = ps.crop_dims(MO)
    k = dr * (trim if trim else dc * 8)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((P_TILE, 4), lambda i, m: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((P_TILE, 4),
                         lambda i, m: (jnp.minimum(i + 1, n_tiles - 1), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, 2 * S_COLS),
                         lambda i, m: (jnp.maximum(m[i], 0) // ps.RX, 0, 0)),
        ],
        out_specs=pl.BlockSpec((P_TILE, S_COLS), lambda i, m: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, P_TILE, dr, dc * 8), jnp.int8),
            pltpu.VMEM(tuple(m_i8.shape[1:]), m_i8.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(_kernel, mo=MO, p_tile=P_TILE, s_cols=S_COLS,
                          dma=dma, roll=roll, mm=mm, mt=mt,
                          flat_only=flat_only, trim=trim),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n_pad, S_COLS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )
    return jax.jit(lambda: f(midx, origins, origins, stacked, m_i8, m_scale))


def main():
    from top_down_renderer_tpu.maps.polar import polar_stencil
    from top_down_renderer_tpu.filter.scoring import rotation_shift

    rng = np.random.default_rng(0)
    c, th, r = 6, 100, 25
    packed = np.zeros((HW, HW, 8), np.float32)
    packed[..., :c] = rng.random((HW, HW, c)) * 50
    packed[..., c] = 1.0
    maps = ps.build_padded_maps(jnp.asarray(packed))
    stencil = jnp.asarray(polar_stencil(th, r))
    scan = jnp.asarray(rng.random((c, th, r)) * 3, jnp.float32)
    cw = jnp.ones((c,), jnp.float32)
    m_var = ps.build_m_tracked(scan, cw, stencil, 1.0, MO, maps.qinv)
    # builders now emit trimmed k and used-columns-only s_m; restore
    # the legacy full-crop layout this harness's kernels expect
    nv, s_m, kk = m_var.shape
    dr_, dc_ = ps.crop_dims(MO)
    t_ = ps.trim_lanes(MO)
    if kk == dr_ * t_ and t_ < dc_ * 8:
        m_var = jnp.pad(
            m_var.reshape(nv, s_m, dr_, t_),
            ((0, 0), (0, 0), (0, 0), (0, dc_ * 8 - t_)),
        ).reshape(nv, s_m, dr_ * dc_ * 8)
    if s_m < S_COLS:
        m_var = jnp.pad(m_var, ((0, 0), (0, S_COLS - s_m), (0, 0)))

    centers = jnp.asarray(rng.random((N, 2)) * (HW - 100) + 50,
                          jnp.float32)
    thetas = jnp.asarray(rng.random(N) * 2 * np.pi, jnp.float32)
    s = rotation_shift(thetas, th)
    ry, y8, xe, rx, _ = ps._origins(centers, maps, MO, 1.0)
    key = ((s // ps.GW) * ps.RX + rx).astype(jnp.int32)
    pos, midx, n_pad = ps._group_layout(key, ps.RX * ps.N_GROUPS, P_TILE)
    origins = jnp.zeros((n_pad, 4), jnp.int32).at[pos].set(
        jnp.stack([ry, y8, xe, jnp.zeros_like(ry)], axis=-1)
    )
    # pre-quantize M (hi/lo) the way _run_kernel does
    m32 = m_var.astype(jnp.float32)
    amax = jnp.max(jnp.abs(m32), axis=-1)
    s_hi = jnp.maximum(amax, 1e-30) / 127.0
    hi = jnp.clip(jnp.round(m32 / s_hi[..., None]), -127, 127)
    res = m32 - hi * s_hi[..., None]
    s_lo = s_hi / 254.0
    lo = jnp.clip(jnp.round(res / s_lo[..., None]), -127, 127)
    m_i8 = jnp.concatenate([hi, lo], axis=1).astype(jnp.int8)
    m_scale = jnp.concatenate([s_hi, s_lo], axis=1)[:, None, :]
    jax.block_until_ready((m_i8, origins))
    n_tiles = n_pad // P_TILE
    print(f"tiles={n_tiles}")

    m_i8_t = jnp.swapaxes(m_i8, 1, 2) + 0
    jax.block_until_ready(m_i8_t)

    abls = (
        ("full", dict(dma=True, roll=True, mm=True)),
        ("full_mt", dict(dma=True, roll=True, mm=True, mt=True)),
        ("no_roll", dict(dma=True, roll=False, mm=True)),
        ("no_mm", dict(dma=True, roll=True, mm=False)),
        ("flat_only", dict(dma=True, roll=True, mm=False,
                           flat_only=True)),
        ("dma_only", dict(dma=True, roll=False, mm=False)),
        ("mm_only", dict(dma=False, roll=True, mm=True)),
        ("mm_only_t", dict(dma=False, roll=True, mm=True, mt=True)),
        ("full_trim", dict(dma=True, roll=True, mm=True, trim=512)),
        ("mm_only_bf16", dict(dma=False, roll=True, mm="bf16")),
        ("mm_only_mixed", dict(dma=False, roll=True, mm="mixed")),
        ("full_bf16", dict(dma=True, roll=True, mm="bf16")),
        ("full_bf16_trim", dict(dma=True, roll=True, mm="bf16",
                                trim=512)),
    )
    if ONLY:
        names = set(ONLY.split(","))
        abls = tuple(a for a in abls if a[0] in names)
    dr, dc8 = ps.crop_dims(MO)[0], ps.crop_dims(MO)[1] * 8
    # bf16 single-plane M at S_COLS rows (tracked M tiled up if needed)
    reps_bf = max(1, S_COLS // m_var.shape[1])
    m_bf = jnp.concatenate([m_var.astype(jnp.bfloat16)] * reps_bf,
                           axis=1)[:, :S_COLS]
    jax.block_until_ready(m_bf)

    for name, kw in abls:
        bf = kw.get("mm") in ("bf16", "mixed")
        mi = m_bf if bf else (m_i8_t if kw.get("mt") else m_i8)
        if kw.get("trim"):
            t = kw["trim"]
            nv = m_i8.shape[0]
            src, rows = (m_bf, S_COLS) if bf else (m_i8, 128)
            mi = (
                src.reshape(nv, rows, dr, dc8)[..., :t]
                .reshape(nv, rows, dr * t)
            )
            jax.block_until_ready(mi)
        fn = build(maps.stacked, origins, midx, mi, m_scale, **kw)
        out = fn()
        float(out[0, 0])  # axon: block_until_ready can return early
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn()
        # the device queue is a single serial stream, so reading the
        # LAST output's value forces completion of all 20
        float(out[0, 0])
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{name:9s} {dt:8.3f} ms  ({dt/n_tiles*1e3:6.2f} us/tile)")


if __name__ == "__main__":
    main()
