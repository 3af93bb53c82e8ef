"""Pallas TPU fast path for particle scoring (uniform scale).

The exact XLA path (filter/scoring.py) is gather-bound: XLA's TPU gather
sustains ~1.7e8 descriptors/s (measured), and the stencil gather needs
N*2500 random reads -> ~1.5 s/step at N=100k.  This kernel restructures
the problem around dense DMA + MXU matmul:

  1. With a UNIFORM particle scale (fixed_scale or frozen - the
     converged/serving regime) the stencil's pixel offsets
     round(offset * scale * res) are shared by every particle, so the
     stencil->pixel selection folded through the rolled-scan circulant
     becomes a shared matrix M and scoring is
         out[p, :] = crop_p_flat @ M
     with crop_p a dense (D, (D+16)*8) window around the particle,
     fetched as ONE strided DMA (contiguous rows, full HBM bandwidth).
  2. Mosaic constrains DMA slice starts to the (8, 128) tiling:
       - y residual (mod 8): handled by 8 row-shifted copies of the map
         stacked on a leading dim the DMA indexes dynamically.
       - x residual (mod 16 px = 128 lanes): handled by an in-kernel
         per-row lane-rotate of the crop by rx*8 (the last 16 px of
         every crop row map to all-zero M coefficients, so the rotate's
         wrap garbage is inert).
  3. Columns are windowed so cost + normalization + known-count fit one
     matmul: particles are sorted by (x-residual, shift-group) and each
     tile selects its M variant via scalar prefetch.  In tracked mode a
     particle needs its own rotation shift only, so a 16-shift window
     (cost 16 | norm 16 | kf) = 33 cols -> 64-wide M.  In the
     theta-search (init) mode all particles share the 40 search shifts
     (state_particle.cpp:195-206) -> (40 | 40 | kf) = 81 -> 128 cols.

Sampling semantics: sample = map[round(cy) + round(dy*f),
round(cx) + round(dx*f)] - a nearest-neighbor discretization that can
differ from the exact path's round(cy + dy*f) by at most one pixel (both
are NN samplings of the same field; the exact path remains the parity
reference, top_down_map_polar.cpp:21-53).  Out-of-bounds windows read a
zero-padded border: dist 0 / known 0 (top_down_map_polar.cpp:38-50).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from top_down_renderer_tpu.filter.scoring import (
    build_circulants,
    circulants_at_shifts,
    rotation_shift,
    search_shifts,
)

C_PAD = 8  # packed map channels (build_grid pads to 8)
RX = 16  # x-residual variants (128-lane alignment / 8 channels)
GW = 16  # tracked-mode shift-window width
N_GROUPS = 7  # ceil(100 / GW) shift groups
MAP_PAD = 64  # zero border on the stacked maps; bounds the max crop

# crop-size buckets keyed by the max stencil pixel offset mo: the crop is
# RECTANGULAR - rows dr = roundup8(2*mo+2) (8-aligned DMA rows), cols
# dc = roundup16(2*mo+17) (16 px extra for the x residual)
_MO_BUCKETS = (12, 24)  # Pallas crop path (p_tile tables below)
# the conv path has no DMA-alignment or VMEM constraints, so it supports
# larger range scales (kernel size grows ~mo^2)
_MO_BUCKETS_CONV = (12, 24, 36, 48)


def pick_crop_size(
    f: float, range_bins: int, buckets=_MO_BUCKETS
) -> int | None:
    """Smallest supported max-offset bucket for scale*res = f, or None if
    the fast path doesn't apply (use the exact gather)."""
    max_off = int(np.ceil((range_bins - 1) * float(f)))
    for mo in buckets:
        if max_off <= mo:
            return mo
    return None


def crop_dims(mo: int):
    """(dr rows, dc col px) for a bucket: rows hold py = dr//2 + off_y in
    [0, dr); cols hold px = rx + (dc-16)//2 + off_x in [0, dc)."""
    dr = ((2 * mo + 2 + 7) // 8) * 8
    dc = ((2 * mo + 17 + 15) // 16) * 16
    return dr, dc


# --- y-folded crop layout (uniform-scale paths) -----------------------
#
# The row-major stacked layout DMAs dr short rows (dc*8 int8 = 640 B at
# mo=24) per crop; the v5e DMA engine sustains only ~300 GB/s on such
# bursts (r5 kernel measurement: 12.2 ms for 3.7 GB).  Folding 8 map
# rows into the lane dim - lane = x*64 + yy*8 + ch - turns each crop
# into dr/8 rows of dc2*64 int8 (3.3 KB at mo=24): 8x longer bursts,
# AND the x-residual granularity tightens from 16 px (128 lanes / 8
# channels) to 2 px (128 lanes / 64 per-px lanes), shrinking the
# rotate margin from 16 px to 2: dc2 = 2*mo+4 vs dc = 2*mo+17 -> ~35%
# fewer crop bytes and ~19% fewer MACs at mo=24.  The in-kernel rx
# lane-rotate argument carries over exactly: roll left by rx*64 <= 64
# lanes wraps garbage into the last crop px, whose M coefficients are
# structurally zero.
#
# Mosaic requires 8-sublane-aligned DMA starts ("Failed to prove that
# a tile index in dimension 0 is divisible by the tiling (8)",
# tests/probe_dma_unaligned.py on v5e), and the fold consumes the 8
# row-shifted copies' y-residual, leaving folded-row starts arbitrary.
# The stack therefore holds 8x8 = 64 copies - (k = y%8 row shift) x
# (d = folded-row shift) - so every crop start is provably 8-aligned:
# crop at padded row y0 reads copy (y0%8)*8 + (y0//8)%8 at folded row
# 8*(y0//64).  HBM cost: 64x the map bytes = 0.5 GB at 1024^2 x 8ch
# int8 (each mip level costs 4x less); that buys 8x longer DMA bursts
# on a path measured burst-limited at ~300 GB/s.  TDR_YFOLD=1.
#
# The K-bucket multi path keeps the row-major layout (its pyramid
# stacking is row-granular); _run_kernel supports both via `yf`.
YF_RX = 2  # x-residual variants in the folded layout (128 lanes/2 px)


def yfold() -> bool:
    """TDR_YFOLD=1 enables the y-folded crop layout (64-copy aligned
    stack, see layout note above).  Default off pending the on-chip
    perf + parity A/B; the HBM cost is 64x the int8 map bytes."""
    return os.environ.get("TDR_YFOLD", "0") == "1"


# --- int4 (nibble-packed) crop layout (uniform-scale paths) -----------
#
# The spread-regime kernel is crop-DMA-bound (r5 ablation: 8.5 ms of
# the 12 ms kernel at mo=24/102k moves 3.67 GB of int8 crops).  Packing
# the 8 map channels of each pixel into 4 bytes - byte j of a pixel
# holds channel 2j in the LOW nibble and channel 2j+1 in the HIGH
# nibble, values quantized to [0, 15] - halves the per-pixel bytes.
# The costs are (a) the 128-lane DMA-start granularity widens from
# 16 px (128/8 B) to 32 px (128/4 B), growing the rotate margin so the
# net crop-byte saving is ~40% at mo=24 rather than 50%, and (b) map
# granularity drops to amax/15 per channel (~3.3 m on a 50 m-truncated
# distance field).  The cost sum averages ~2,500 independently-rounded
# map cells, so the statistical cost noise is ~0.2% (interpret parity
# test bounds it); the known channel's {0, 1} maps to {0, 15} exactly,
# keeping norm/kf arithmetic exact.
#
# In-kernel the unpack is three i32 VPU ops on the rolled crop's int32
# bitcast view (w & 0x0F0F0F0F -> even channels, (w >> 4) & 0x0F0F0F0F
# -> odd channels; the arithmetic-shift sign fill lands only on masked
# bits) and the contraction splits into two half-K int8 MXU passes
# against an even/odd-plane-split M - the same total MACs as the
# trimmed int8 layout.  The x-residual lane-rotate carries over
# unchanged: the i32 bitcast roll is lane(=byte)-granular and rx*4
# bytes = rx whole pixels, so nibble pairing is never split.
I4_RX = 32  # x-residual variants (128 lanes / 4 bytes per px)


def map_int4() -> bool:
    """TDR_MAP_INT4=1 stores the crop-DMA map stack nibble-packed
    (uniform-scale crop paths only; the K-bucket multi pyramid stays
    int8).  Stays OFF: the on-chip A/B measured it SLOWER despite
    -36% crop-DMA bytes (spread tracked 38.3 vs 50.5 steps/s int8;
    kernel micro-bench 19.5 vs 12.2 ms) - the e-dot nibble unpack
    doubles the contraction's dot count and the kernel is
    compute-bound, not DMA-bound, at these shapes.  Hardware parity
    is clean (1.6e-3 median rel), so the layout remains available
    for a future DMA-bound regime."""
    return os.environ.get("TDR_MAP_INT4", "0") == "1"


def crop_cols_i4(mo: int) -> int:
    """int4-layout crop width in px: reach px = rx + (mo+1) + off_x
    <= 2*mo + 32, rounded to the 32-px lane tile (128 lanes = 32 px)."""
    return -(-(2 * mo + 33) // 32) * 32


def trim_bytes_i4(mo: int) -> int:
    """Per-plane contraction width in packed bytes.  M support ends at
    px = 2*mo + 1 (rx = 0 build), i.e. (2*mo + 2) * 4 bytes, rounded to
    the 128-lane tile.  The rx roll wraps garbage into the last
    (I4_RX - 1) * 4 = 124 bytes; the trim must stop short of them."""
    t = -(-((2 * mo + 2) * 4) // 128) * 128
    dcb = crop_cols_i4(mo) * 4
    assert t <= dcb - (I4_RX - 1) * 4, (mo, t, dcb)
    return t


def crop_cols_yf(mo: int) -> int:
    """Folded-layout crop width in px: reach 2*mo+1, +1 px rotate
    margin, rounded to the 2-px lane-tile (128 lanes = 2 px)."""
    return 2 * mo + 4


def yf_dma_rows(mo: int) -> int:
    """Folded crop rows actually fetched per crop DMA (dr/8: the fold
    packs 8 map rows per folded row)."""
    return crop_dims(mo)[0] // 8


def yf_buf_rows(mo: int) -> int:
    """VMEM crop-buffer rows: yf_dma_rows rounded up to a multiple of
    4 so the in-kernel int8 -> i32 bitcast (which packs 4 SUBLANES per
    i32 row) is legal at every mo — dr//8 = 7 at mo=24 broke Mosaic
    lowering ("the 2nd minor dim can not be perfectly packed").  The
    pad rows are never DMA'd (uninitialized VMEM) and contract against
    structurally-zero M columns, so they contribute exactly 0."""
    return -(-yf_dma_rows(mo) // 4) * 4


def trim_lanes(mo: int) -> int:
    """Contraction width (int8 lanes) actually carrying M support.

    M places stencil points at px = (dc-16)//2 + off_x with
    |off_x| <= mo (_stencil_pix + the pick_crop_size gate), so every
    lane past ((dc-16)//2 + mo + 1)*8 is a structurally-zero M column;
    the kernel contracts only the first trim_lanes(mo) lanes (128-
    aligned static slice) - 20% fewer MACs at mo=24, 33% at mo=12.
    The in-kernel rx roll wraps garbage into lanes [dc8-rx8, dc8);
    rx8 <= (RX-1)*8, so the trim also has to stop short of the wrap
    region (asserted)."""
    dr, dc = crop_dims(mo)
    need = ((dc - 16) // 2 + mo + 1) * C_PAD
    t = min(-(-need // 128) * 128, dc * C_PAD)
    assert t <= dc * C_PAD - (RX - 1) * C_PAD or t == dc * C_PAD, (
        mo, t
    )
    return t


def tracked_p_tile(mo: int, multi: bool = False) -> int:
    # Rows streamed per MXU weight load: the dominant efficiency knob
    # for the in-kernel int8 dot (p_tile rows amortize each 128x128
    # weight-tile load) and for the ~2.7 us/tile grid overhead; the
    # cost is group padding (tiles are (variant, rx)-uniform).  VMEM
    # at mo=24/p_tile=64: 2x double-buffered int8 crops 4.6 MB +
    # trimmed M 3.7 MB.  TDR_P_TILE_TRACKED overrides for sweeps.
    #
    # The K-bucket multi path has ~12x the group count (K*N_GROUPS*RX
    # = 1344 vs 112), so group padding dominates at the uniform-path
    # tile size: mo=12 multi-tracked measured 29.2 ms at p_tile=192
    # (n_pad 3.1x the particle count) vs 18.9/18.5 ms at 64/32 on
    # v5e at 102,400 particles (r4 sweep).
    env = os.environ.get("TDR_P_TILE_TRACKED")
    if env:
        return int(env)
    if multi:
        return {12: 64, 24: 64}[mo]
    return {12: 192, 24: 64}[mo]


def init_p_tile(mo: int) -> int:
    # init-flavor M is 128-wide (x2 hi/lo = 256 rows resident).  The
    # r4 on-chip sweep (benchmarks/p_tile_sweep.jsonl): mo=24 init at
    # p_tile 32/128/256 = 41.7/49.0/44.5 steps/s (102k, spread cloud)
    # and multi-init 34.4 -> 36.6, so 128 is baked; tracked stays 64
    # (42.2 at 64 vs 41.6 at 128 - the narrower M amortizes already).
    env = os.environ.get("TDR_P_TILE_INIT")
    return int(env) if env else {12: 128, 24: 128}[mo]


def m_hilo() -> bool:
    """True (default) = full hi/lo int8 M split: every column gets a lo
    residual plane (effective ~16-bit M), doubling the contraction's
    output columns and MACs.  TDR_M_HILO=0 switches to the single-plane
    'lokf' scheme (only the kf column keeps a lo residual, packed into
    the adjacent structurally-zero column) - HALF the MACs but measured
    ~3% systematic cost error at mo=24: the polar stencil's center-cell
    collisions make column amax ~200x the typical coefficient
    (median |coef|/amax = 0.005, /tmp/qerr.py round 4), so single-plane
    per-column int8 underquantizes the light cells.  Kept as a sweep
    knob to bound the MAC-vs-efficiency question on hardware."""
    return os.environ.get("TDR_M_HILO", "1") == "1"


from flax import struct


@struct.dataclass
class PaddedMaps:
    """Device-resident DMA-ready map stack; rebuild on map change.

    The crop-DMA stack is stored int8 with per-channel quantization
    (halves the dominant spread-regime HBM traffic vs bf16); the
    dequantization multipliers `qinv` are folded into the M builds, and
    the kernel contracts the int8 crops directly on the int8 MXU (M is
    hi/lo-split int8, see _run_kernel), so the crop values carry no
    rounding beyond this quantization.  The known/mask channel's values
    {0, 1} quantize exactly, keeping norm and known-count arithmetic
    exact."""

    stacked: jnp.ndarray  # (8, Hp, Wp*8) int8 row-shifted copies, or
    #                       (64, Hp/8, Wp*64) when yf (y-folded layout),
    #                       or (8, Hp, Wp*4) nibble-packed when i4
    padded3d: jnp.ndarray  # (Hp, Wp, 8) bf16 (conv_score path)
    padded4d: jnp.ndarray  # (~Hp/4, ~Wp/4, 128) bf16 s2d phase fold
    qinv: jnp.ndarray = None  # (8,) f32 per-channel dequant multipliers
    padded4d_i8: jnp.ndarray = None  # int8 s2d fold (TDR_CONV_INT8)
    qinv4d: jnp.ndarray = None  # (8,) f32 scales for padded4d_i8
    hp: int = struct.field(pytree_node=False, default=0)
    wp: int = struct.field(pytree_node=False, default=0)
    pad: int = struct.field(pytree_node=False, default=0)
    yf: bool = struct.field(pytree_node=False, default=False)
    i4: bool = struct.field(pytree_node=False, default=False)


def quantize_channels(packed: jnp.ndarray):
    """(H, W, 8) f32 -> (int8 quantized, (8,) f32 qinv): symmetric
    per-channel scales q = 126/max|v| so known-channel {0,1} maps to
    {0,126} exactly and distance channels get ~max/126 granularity."""
    p32 = packed.astype(jnp.float32)
    amax = jnp.maximum(
        jnp.max(jnp.abs(p32), axis=(0, 1)), 1e-6
    )  # (8,)
    q = 126.0 / amax
    pq = jnp.clip(jnp.round(p32 * q), -127, 127).astype(jnp.int8)
    return pq, amax / 126.0


def quantize_channels_int4(packed: jnp.ndarray):
    """(H, W, 8) f32 -> ((H, W, 4) int8 nibble-packed bytes, (8,) f32
    qinv).  Byte j of a pixel = ch 2j | (ch 2j+1 << 4), with even
    channels quantized to [0, 15] (q = 15/max) and odd channels to
    [0, 7] (q = 7/max) so the packed byte stays <= 127: a VALID SIGNED
    int8 equal to e + 16*o, which lets the kernel contract the RAW
    packed bytes on the MXU (see _kernel's e-dot identity) with only
    ONE unpack op.  The map channels are non-negative by construction
    (truncated distance fields + the {0, 1} known mask, which maps to
    {0, 15} / {0, 7} exactly - norm/kf arithmetic stays exact on
    either parity); negative inputs would clamp to 0."""
    p32 = packed.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(p32, axis=(0, 1)), 1e-6)  # (8,)
    qmax = jnp.asarray([15.0, 7.0] * 4, jnp.float32)
    v = jnp.clip(
        jnp.round(p32 * (qmax / amax)), 0, qmax
    ).astype(jnp.int32)
    byte = v[..., 0::2] | (v[..., 1::2] << 4)  # (H, W, 4) in [0, 127]
    pq = jax.lax.bitcast_convert_type(
        byte.astype(jnp.uint8), jnp.int8
    )
    return pq, amax / qmax


def build_padded_maps(packed: jnp.ndarray, pad: int = MAP_PAD) -> PaddedMaps:
    """(H, W, 8) f32 -> zero-padded 2D view stacked over 8 y-shifts
    (int8-quantized for the crop DMA path; bf16 for the conv path).
    Zeros = dist 0 / known 0 = the reference's out-of-bounds values."""
    from top_down_renderer_tpu.filter.conv_score import fold_map_s2d

    yf = yfold()
    i4 = map_int4() and not yf
    if i4:
        pq, qinv = quantize_channels_int4(packed)
    else:
        pq, qinv = quantize_channels(packed)
    p = jnp.pad(pq, ((pad, pad + 8), (pad, pad), (0, 0)))
    hp_full = p.shape[0]
    wp = p.shape[1]
    hp = hp_full - 8
    if yf:
        # y-folded copies (lane = x*64 + yy*8 + ch): copy k*8+d holds
        # rows [k+8d, k+8d+hp) folded, so a crop at row y0 finds its
        # folded rows at the 8-ALIGNED start 8*(y0//64) of copy
        # (y0%8)*8 + (y0//8)%8 (Mosaic sublane-alignment proof, see
        # layout note); hp rounded down to the fold
        hp = hp - hp % 8
        p64 = jnp.pad(p, ((0, 64), (0, 0), (0, 0)))
        stacked = (
            jnp.stack(
                [
                    p64[k + 8 * d : k + 8 * d + hp]
                    for k in range(8)
                    for d in range(8)
                ]
            )
            .reshape(64, hp // 8, 8, wp, C_PAD)
            .transpose(0, 1, 3, 2, 4)
            .reshape(64, hp // 8, wp * 8 * C_PAD)
        )
    else:
        p2 = p.reshape(hp_full, wp * (4 if i4 else C_PAD))
        stacked = jnp.stack([p2[k : k + hp] for k in range(8)])
    pb = jnp.pad(
        packed.astype(jnp.bfloat16), ((pad, pad + 8), (pad, pad), (0, 0))
    )
    # int8 s2d fold for the TDR_CONV_INT8 cost field: reuse the crop
    # stack's quantization (i4 nibble-packs pq, so quantize afresh)
    if i4:
        pq8, qinv8 = quantize_channels(packed)
        p8 = jnp.pad(pq8, ((pad, pad + 8), (pad, pad), (0, 0)))
    else:
        pq8, qinv8 = pq, qinv
        p8 = p
    return PaddedMaps(
        stacked=stacked, padded3d=pb[:hp], padded4d=fold_map_s2d(pb[:hp]),
        qinv=qinv,
        padded4d_i8=fold_map_s2d(p8[:hp], jnp.int8),
        qinv4d=qinv8,
        hp=int(hp), wp=int(wp), pad=int(pad), yf=yf, i4=i4,
    )



def _build_base_y_from_pix(
    pix8: jnp.ndarray,  # (TR,) K-row base index per stencil point
    kext: int,
    c: int,
    cost_cols: jnp.ndarray,  # (TR*C, n_cost) - rows in (theta,r,c) order
    norm_cols: jnp.ndarray,  # (TR, n_norm)
    s_cols: int,
    qinv: jnp.ndarray | None = None,  # (C_PAD,) dequant per crop channel
) -> jnp.ndarray:
    """Build the base tensor y (C_PAD, s_cols, n_slots) f32.

    TPU scatter collision-serializes (0.85 ms for these shapes even at
    block granularity), so the stencil->K-row selection is a dense
    one-hot MXU matmul - at CELL granularity: every stencil cell's 8
    channels share one pixel slot (pix8 is always a multiple of C_PAD),
    so the one-hot is (TR, Kext/8) instead of (TR*8, Kext) - 64x less
    one-hot materialization than the row-granularity form (12 MB vs
    800 MB at mo=24; 2.6 ms -> ~0.15 ms measured):
      y[(ch, s), slot] = circ3_T ((C_PAD*s_cols), TR) @ onehot (TR, slots)
      base_T[s, slot*C_PAD + ch] = y[(ch, s), slot]
    """
    circ2 = _make_circ2(
        pix8.shape[0], c, cost_cols, norm_cols, s_cols, qinv
    )
    n_slots = kext // C_PAD
    lhs = (
        circ2.transpose(1, 2, 0)
        .reshape(C_PAD * s_cols, pix8.shape[0])
        .astype(jnp.bfloat16)
    )
    y = _onehot_contract(lhs, pix8 // C_PAD, n_slots)
    return y.reshape(C_PAD, s_cols, n_slots)


def _make_circ2(tr, c, cost_cols, norm_cols, s_cols, qinv):
    """(tr, C_PAD, s_cols) coefficient tensor: channels < c carry cost,
    channel c carries norm + the kf count, channels > c are zero
    padding; per-channel dequantization (qinv) is folded in so the
    quantized crop values need no separate dequant pass."""
    n_cost = cost_cols.shape[1]
    n_norm = norm_cols.shape[1]
    circ2 = jnp.zeros((tr, C_PAD, s_cols), jnp.float32)
    circ2 = circ2.at[:, :c, :n_cost].set(
        cost_cols.reshape(tr, c, n_cost)
    )
    circ2 = circ2.at[:, c, n_cost : n_cost + n_norm].set(norm_cols)
    circ2 = circ2.at[:, c, n_cost + n_norm].set(1.0)
    if qinv is not None:
        circ2 = circ2 * qinv[None, :, None]
    return circ2


def _onehot_contract(lhs, pix_cell, n_slots):
    """lhs (rows, tr) bf16 @ onehot(pix_cell) (tr, n_slots) -> (rows,
    n_slots) f32, with the one-hot chunked to ~16 MB of bf16."""
    tr = pix_cell.shape[0]
    n_chunks = max(1, -(-(tr * n_slots * 2) // (16 << 20)))
    kc = -(-n_slots // (n_chunks * 128)) * 128
    parts = []
    for j in range(n_chunks):
        kidx = j * kc + jax.lax.broadcasted_iota(jnp.int32, (1, kc), 1)
        onehot = (pix_cell[:, None] == kidx).astype(jnp.bfloat16)
        parts.append(
            jnp.dot(lhs, onehot, preferred_element_type=jnp.float32)
        )
    return jnp.concatenate(parts, axis=1)[:, :n_slots]


def _build_base_t_i4(
    pix4: jnp.ndarray,  # (TR,) plane-byte base index per stencil cell
    kext_plane: int,  # dr * trim_bytes_i4(mo)
    circ2: jnp.ndarray,  # (TR, C_PAD, s_cols) f32, qinv folded
    with_amax: bool = False,
):
    """int4-layout base matrix: (s_cols, 2*kext_plane) bf16.  Within a
    plane k = py * trim_bytes_i4 + px * 4 + ch // 2.

    The kernel contracts the low-nibble array e against the FIRST half
    and the RAW packed bytes b = e + 16*o against the SECOND half, so
    the planes emitted here are the e-dot identity's coefficients:

        [ Me - Mo/16  |  Mo/16 ]
        sum e*(Me - Mo/16) + sum (e + 16*o)*(Mo/16) = sum e*Me + o*Mo

    - one VPU mask op per crop instead of a full two-plane unpack."""
    n_slots = kext_plane // 4
    pix_cell = pix4 // 4
    ys = []
    for plane in (circ2[:, 0::2, :], circ2[:, 1::2, :]):
        lhs = (
            plane.transpose(1, 2, 0)
            .reshape(4 * plane.shape[2], plane.shape[0])
            .astype(jnp.bfloat16)
        )
        ys.append(
            _onehot_contract(lhs, pix_cell, n_slots).reshape(
                4, plane.shape[2], n_slots
            )
        )
    y_e = ys[0] - ys[1] / 16.0
    y_b = ys[1] / 16.0
    s = circ2.shape[2]
    outs = [
        y.transpose(1, 2, 0).reshape(s, n_slots * 4).astype(jnp.bfloat16)
        for y in (y_e, y_b)
    ]
    out = jnp.concatenate(outs, axis=-1)
    if with_amax:
        amax = jnp.maximum(
            jnp.max(jnp.abs(y_e), axis=(0, 2)),
            jnp.max(jnp.abs(y_b), axis=(0, 2)),
        )
        return out, amax
    return out


def _build_base_t_from_pix(
    pix8: jnp.ndarray,
    kext: int,
    c: int,
    cost_cols: jnp.ndarray,
    norm_cols: jnp.ndarray,
    s_cols: int,
    qinv: jnp.ndarray | None = None,
    with_amax: bool = False,
):
    """(s_cols, kext) bf16 with K-row layout k = slot*C_PAD + ch (the
    crop kernel's M layout).

    with_amax=True also returns max|row| (s_cols,) f32, computed from
    the f32 y in the SAME pass (fuses with the relayout read): a
    standalone max-abs reduce over the finished bf16 table measured
    ~4.5 ms at K-bucket multi sizes on v5e.  _run_kernel inflates the
    given amax by (1 + 2^-8) to cover the bf16 rounding of the table
    values it quantizes."""
    y = _build_base_y_from_pix(
        pix8, kext, c, cost_cols, norm_cols, s_cols, qinv
    )
    n_slots = kext // C_PAD
    out = (
        y.transpose(1, 2, 0)
        .reshape(s_cols, n_slots * C_PAD)
        .astype(jnp.bfloat16)
    )
    if with_amax:
        return out, jnp.max(jnp.abs(y), axis=(0, 2))
    return out


def _stencil_pix(
    stencil: jnp.ndarray, f, mo: int, yf: bool = False,
    i4: bool = False,
):
    """Stencil offsets -> crop-pixel coordinates at rx=0."""
    dr, dc = crop_dims(mo)
    off = jnp.round(stencil.reshape(-1, 2) * f).astype(jnp.int32)
    py = off[:, 0] + dr // 2
    if yf or i4:
        px = off[:, 1] + mo + 1  # matches _origins' x0 = cx-(mo+1)
    else:
        px = off[:, 1] + (dc - 16) // 2
    return py, px


def _build_base_t(
    mo: int,
    py: jnp.ndarray,
    px: jnp.ndarray,
    c: int,
    cost_cols: jnp.ndarray,
    norm_cols: jnp.ndarray,
    s_cols: int,
    qinv: jnp.ndarray | None = None,
    with_amax: bool = False,
    yf: bool = False,
    i4: bool = False,
):
    """Crop-path base matrix, emitted directly in the kernel's TRIMMED
    contraction layout k = py * trim_lanes(mo) + px * C_PAD + ch.

    Every stencil px satisfies (px + 1) * C_PAD <= trim_lanes(mo) by
    construction (the pick_crop_size gates bound |off_x| <= mo), so
    building at dr * t instead of dr * dc * C_PAD skips the
    structurally-zero lane columns at the SOURCE: ~20% fewer build-
    matmul FLOPs at mo=24 and no post-hoc trim reshape pass over M
    tables that reach hundreds of MB on the K-bucket multi path.

    yf: the y-folded contraction layout
    k = (py//8)*(dc2*64) + px*64 + (py%8)*8 + ch (no separate trim:
    the 1-2 px rotate margin is the only slack).

    i4: the nibble-packed layout - even/odd channel planes concatenated
    along k (see _build_base_t_i4)."""
    dr, dc = crop_dims(mo)
    if i4:
        t4 = trim_bytes_i4(mo)
        circ2 = _make_circ2(
            norm_cols.shape[0], c, cost_cols, norm_cols, s_cols, qinv
        )
        return _build_base_t_i4(
            py * t4 + px * 4, dr * t4, circ2, with_amax
        )
    if yf:
        dc2 = crop_cols_yf(mo)
        lanes = dc2 * 8 * C_PAD
        pix8 = (py // 8) * lanes + px * 8 * C_PAD + (py % 8) * C_PAD
        return _build_base_t_from_pix(
            pix8, yf_buf_rows(mo) * lanes, c, cost_cols, norm_cols,
            s_cols, qinv, with_amax,
        )
    t = trim_lanes(mo)
    pix8 = py * t + px * C_PAD
    return _build_base_t_from_pix(
        pix8, dr * t, c, cost_cols, norm_cols, s_cols, qinv, with_amax
    )


def build_m_tracked(
    scan: jnp.ndarray,
    class_weights: jnp.ndarray,
    stencil: jnp.ndarray,
    f,
    mo: int,
    qinv: jnp.ndarray | None = None,
    with_amax: bool = False,
    yf: bool = False,
    i4: bool = False,
):
    """(N_GROUPS, 2*GW+2, K) bf16 variants for tracked mode, transposed
    so the kernel's manual M DMA slices along the 128-aligned K minor.

    Variant g columns: [0:16) cost at shifts [16g, 16g+16), [16:32)
    norm at the same shifts, [32] known count.  The x-residual is NOT a
    variant axis: the kernel lane-rotates each crop tile instead (16x
    less M build/memory/DMA)."""
    c, th, r = scan.shape
    py, px = _stencil_pix(stencil, f, mo, yf, i4)

    # per-group shift windows, built at the USED shifts only (one row
    # gather, circulants_at_shifts) and the USED columns only (2*GW
    # cost/norm + kf + lokf slot = 34 of the kernel's 64: _run_kernel
    # zero-pads post-quant); the one-hot selection inside
    # _build_base_t is shared across the vmap (it doesn't depend on g)
    cols = (
        jnp.arange(N_GROUPS)[:, None] * GW + jnp.arange(GW)[None, :]
    ) % th  # (7, 16)
    cost_sel, norm_sel = circulants_at_shifts(
        scan, class_weights, cols.reshape(-1)
    )  # (TR*C, 7*16), (TR, 7*16)
    return jax.vmap(
        lambda cc, nc: _build_base_t(
            mo, py, px, c, cc, nc, 2 * GW + 2, qinv, with_amax, yf, i4
        )
    )(
        jnp.moveaxis(cost_sel.reshape(-1, N_GROUPS, GW), 1, 0),
        jnp.moveaxis(norm_sel.reshape(-1, N_GROUPS, GW), 1, 0),
    )  # (7, 2*GW+2, dr*t)[, amax (7, 2*GW+2)]


def build_m_init(
    scan: jnp.ndarray,
    class_weights: jnp.ndarray,
    stencil: jnp.ndarray,
    f,
    mo: int,
    num_rot: int = 40,
    qinv: jnp.ndarray | None = None,
    with_amax: bool = False,
    yf: bool = False,
    i4: bool = False,
):
    """(1, 2*num_rot+2, K) bf16 for the theta-search mode: cols
    [0:num_rot) cost at the search shifts, [num_rot:2*num_rot) norm,
    [2*num_rot] kf.  Single variant - the kernel handles the x-residual
    by rotating the crop."""
    c, th, r = scan.shape
    ssh = search_shifts(th, num_rot)
    cost_sel, norm_sel = circulants_at_shifts(scan, class_weights, ssh)
    py, px = _stencil_pix(stencil, f, mo, yf, i4)
    # used columns only (2*num_rot + kf + lokf slot = 82 of the
    # kernel's 128); _run_kernel zero-pads post-quant
    out = _build_base_t(
        mo, py, px, c, cost_sel, norm_sel, 2 * num_rot + 2, qinv,
        with_amax, yf, i4,
    )  # (2*num_rot+2, dr*t)
    if with_amax:
        return out[0][None], out[1][None]
    return out[None]  # (1, 2*num_rot+2, dr*t)


def _kernel(
    midx_ref, origins_ref, origins_next_ref, stacked_ref, m_hbm_ref,
    m_scale_ref, locals_ref, out_ref, crop_buf, m_buf, prev_idx, m_sem,
    sems, *, mo: int, p_tile: int, s_cols: int, interp: bool = False,
    sel: bool = False, sel_init: int = 0, kf_thresh: float = 0.0,
    lokf: bool = False, kf_col: int = -1, yf: bool = False,
    i4: bool = False,
):
    """Double-buffered crop pipeline: tile i's matmul overlaps tile i+1's
    crop DMAs.  Crop-completion waits are batched on one per-slot
    semaphore (DMA semaphores count bytes).

    M is single-buffered and refetched (with a stall) only when the
    variant changes: tiles are sorted variant-major (_group_layout), so
    the refetch happens once per variant run, and the wide init M
    (128 cols) doesn't fit VMEM twice anyway.

    The sort key packs (variant, x-residual): midx_ref holds
    key = variant * RX + rx per tile (tiles are key-uniform by
    construction, _group_layout).  The kernel selects M by variant and
    LANE-ROTATES the crop tile left by rx*8 in VMEM - equivalent to the
    old 16 pre-rolled M variants (the last 16 px of every crop row are
    zero rows of M, so the per-row rotate's wrap garbage lands on zero
    coefficients) but with 16x less M memory/build/DMA, which is what
    made K-bucket multi-scale tracked M builds blow past HBM."""
    dr, dc = crop_dims(mo)
    if yf:
        rows = yf_buf_rows(mo)  # VMEM rows (bitcast-legal multiple of 4)
        rows_dma = yf_dma_rows(mo)  # folded rows actually fetched
        dc8 = crop_cols_yf(mo) * 8 * C_PAD  # lanes per folded row
        rxm = YF_RX
        rxl = 8 * C_PAD  # lanes per px
    elif i4:
        rows = rows_dma = dr
        dc8 = crop_cols_i4(mo) * 4  # packed bytes per row
        rxm = I4_RX
        rxl = 4  # bytes per px
    else:
        rows = rows_dma = dr
        dc8 = dc * C_PAD
        rxm = RX
        rxl = C_PAD
    i_tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    key_t = midx_ref[i_tile]
    live = key_t >= 0  # -1 = dead tail tile (occupied-only padding)
    key_c = jnp.maximum(key_t, 0)
    midx = key_c // rxm
    rx8 = jax.lax.rem(key_c, rxm) * rxl
    key_next_raw = midx_ref[jnp.minimum(i_tile + 1, n_tiles - 1)]
    next_live = (i_tile + 1 < n_tiles) & (key_next_raw >= 0)
    slot = jax.lax.rem(i_tile, 2)
    nslot = jax.lax.rem(i_tile + 1, 2)

    def m_dma0():
        return pltpu.make_async_copy(
            m_hbm_ref.at[midx], m_buf, m_sem
        )

    need_m = (
        (i_tile == 0) | (midx != prev_idx[0])
    ) & live

    @pl.when(need_m)
    def _():
        m_dma0().start()

    def dma(orig, i, s):
        # origins store y8/8 and xe/128: multiplying in-kernel lets
        # Mosaic prove the (8, 128)-tile alignment of the slice start
        # (y-folded maps too: the 64-copy stack absorbs both the row
        # and the folded-row residual, see the layout note)
        row0 = orig[i, 1] * 8
        dst = crop_buf.at[s, i]
        if rows_dma != rows:  # yf: buffer rows are bitcast-padded
            dst = crop_buf.at[s, i, pl.ds(0, rows_dma)]
        return pltpu.make_async_copy(
            stacked_ref.at[
                orig[i, 0],
                pl.ds(row0, rows_dma),
                pl.ds(orig[i, 2] * 128, dc8),
            ],
            dst,
            sems.at[s],
        )

    @pl.when((i_tile == 0) & live)
    def _():
        jax.lax.fori_loop(
            0, p_tile,
            lambda i, _: (dma(origins_ref, i, slot).start(), 0)[1],
            0, unroll=True,
        )

    # prefetch next tile's crops into the other slot (skip dead tiles:
    # the waiter below is predicated on the SAME key>=0 condition)
    @pl.when(next_live)
    def _():
        jax.lax.fori_loop(
            0, p_tile,
            lambda i, _: (dma(origins_next_ref, i, nslot).start(), 0)[1],
            0, unroll=True,
        )

    @pl.when(need_m)
    def _():
        m_dma0().wait()

    @pl.when(live)
    def _():
        prev_idx[0] = midx

    @pl.when(live)
    def _():
        # one batched wait for all of this slot's crop bytes: a
        # synthetic descriptor over the whole slot buffer waits for the
        # same byte count the p_tile individual DMAs signalled.
        # (A dead-pad-slot DMA skip was measured a NET LOSS here:
        # predicating the unrolled per-slot starts/waits on a live
        # count cost more scalar-core time than the ~20% padding
        # bytes saved - 18.9 vs 18.1 ms on the K-bucket tracked
        # kernel, r4 stage profile.)
        wait_ref = crop_buf.at[slot]
        if rows_dma != rows:  # match the DMA'd byte count, not the
            wait_ref = crop_buf.at[slot, :, pl.ds(0, rows_dma)]  # pad
        pltpu.make_async_copy(wait_ref, wait_ref, sems.at[slot]).wait()
        # x-residual alignment: rotate each crop row left by rx*8 lanes
        # (wrap lands on always-zero M columns, see docstring).
        # Mosaic's dynamic lane rotate only supports 32-bit data; the
        # free bitcast to an i32 view (sublane packing - lane indices
        # preserved; hardware-validated for int8 by tests/probe_int8.py)
        # rotates all packed int8 rows identically, which IS the
        # per-row minor rotate.  Interpret mode emulates with an f32
        # round-trip instead (no packed-layout dependency).
        if interp:
            rolled = pltpu.roll(
                crop_buf[slot].astype(jnp.float32),
                jax.lax.rem(dc8 - rx8, dc8),
                2,
            ).astype(jnp.int8)
        else:
            ci = pltpu.bitcast(crop_buf[slot], jnp.int32)
            rolled = pltpu.bitcast(
                pltpu.roll(ci, jax.lax.rem(dc8 - rx8, dc8), 2),
                jnp.int8,
            )
        # contract only the lanes carrying M support (trim_lanes):
        # everything past them is structurally-zero M columns + the
        # roll's wrap garbage.  (y-folded layout: the margin is only
        # 1-2 px, keep the full row.)
        if i4:
            # nibble-packed crops, e-dot identity: the packed byte is
            # the SIGNED value b = e + 16*o by construction (odd
            # channels quantize to [0, 7], quantize_channels_int4), so
            # contracting the RAW bytes against Mo/16 and the masked
            # low nibbles e against Me - Mo/16 (both emitted by
            # _build_base_t_i4) reconstructs e.Me + o.Mo exactly - the
            # only VPU work per crop is one i32 mask (the full
            # two-plane unpack + plane concat measured 26.5 ms/step vs
            # int8's 19.2: three VMEM-sized temp writes serialized
            # against the MXU).
            t = trim_bytes_i4(mo)
            tr8 = rolled[:, :, :t]
            if interp:
                e8 = tr8 & jnp.int8(15)
            else:
                w = pltpu.bitcast(tr8, jnp.int32)
                e8 = pltpu.bitcast(w & 0x0F0F0F0F, jnp.int8)
            k2 = rows * t
            acc = jax.lax.dot_general(
                e8.reshape(p_tile, k2),
                m_buf[:, :k2],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + jax.lax.dot_general(
                tr8.reshape(p_tile, k2),
                m_buf[:, k2:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            t = dc8 if yf else trim_lanes(mo)
            if t < dc8:
                rolled = rolled[:, :, :t]
            flat = rolled.reshape(p_tile, rows * t)
            # one int8 x int8 MXU contraction over [M_hi | M_lo] (2x
            # the bf16 rate, full 128 output lanes, and no int8 ->
            # bf16 convert pass over the crops); per-(variant, column)
            # scales dequantize the i32 accumulator halves (hardware-
            # exact int8 matmul: tests/probe_int8_mm.py)
            acc = jax.lax.dot_general(
                flat,
                m_buf[...],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        sc = acc.astype(jnp.float32) * m_scale_ref[0]
        # lokf: single int8 plane; the kf column's lo residual rides the
        # adjacent structurally-zero column and is folded at the reads
        # below.  Legacy hilo: fold the full lo half back per column.
        res = sc if lokf else sc[:, :s_cols] + sc[:, s_cols:]
        if sel:
            # tracked mode: select each particle's (cost, norm, kf)
            # in-kernel (cheap VPU lane-compare) and emit them at lanes
            # 0/1/2, so the host reads back with DISTINCT-slot scatters
            # instead of three 102k-descriptor gathers (TPU gathers are
            # descriptor-bound at ~1.7e8/s; distinct scatters are ~free)
            loc = locals_ref[...]  # (p_tile, 1) int32 window column
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (p_tile, s_cols), 1
            )
            # where() keeps other lanes' NaNs out of the sum while a
            # NaN at the selected lane still propagates (parity with
            # the gather it replaces)
            cost = jnp.sum(
                jnp.where(lane == loc, res, 0.0), 1, keepdims=True
            )
            norm = jnp.sum(
                jnp.where(lane == loc + GW, res, 0.0), 1,
                keepdims=True,
            )
            kf = res[:, kf_col][:, None]
            if lokf:
                kf = kf + res[:, kf_col + 1][:, None]
            out_ref[...] = jnp.where(
                lane == 0,
                cost,
                jnp.where(lane == 1, norm, jnp.where(lane == 2, kf, 0.0)),
            )
        elif sel_init:
            # init mode: fold the whole select_init_cost epilogue
            # (state_particle.cpp:195-206 argmin + NaN->FLT_MAX + the
            # kf<0.5 gate) into the kernel, emitting (best_cost, argmin
            # index, kf count) at lanes 0/1/2 so the host reads back
            # with distinct-slot scatters instead of an (n_pad, 128)
            # row gather (~0.6 ms of descriptor-bound gather at 102k).
            nr = sel_init
            flt_max = float(np.finfo(np.float32).max)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (p_tile, s_cols), 1
            )
            # align den_k (cols nr..2nr) under num_k (cols 0..nr):
            # rolling left by nr = rolling right by s_cols - nr
            den = pltpu.roll(res, s_cols - nr, 1)
            c = res / den
            c = jnp.where(jnp.isnan(c), flt_max, c)
            kf_mask = lane == 2 * nr
            if lokf:
                kf_mask = kf_mask | (lane == 2 * nr + 1)
            kfc = jnp.sum(
                jnp.where(kf_mask, res, 0.0), 1, keepdims=True
            )
            # kf < 0.5 gate on the raw known count (kf = kfc/(th*r));
            # +inf on the non-cost lanes keeps them out of the argmin
            # while an all-FLT_MAX row still yields (FLT_MAX, k=0)
            c = jnp.where(kfc < kf_thresh, flt_max, c)
            c = jnp.where(lane >= nr, jnp.inf, c)
            best = jnp.min(c, 1, keepdims=True)
            bk = jnp.min(
                jnp.where(c == best, lane, s_cols), 1, keepdims=True
            ).astype(jnp.float32)
            out_ref[...] = jnp.where(
                lane == 0,
                best,
                jnp.where(lane == 1, bk, jnp.where(lane == 2, kfc, 0.0)),
            )
        else:
            out_ref[...] = res


@functools.partial(
    jax.jit,
    static_argnames=(
        "mo", "p_tile", "s_cols", "interpret", "sel", "sel_init",
        "kf_thresh", "lokf", "kf_col", "yf", "i4",
    ),
)
def _run_kernel(
    stacked: jnp.ndarray,
    origins: jnp.ndarray,
    midx: jnp.ndarray,
    m_var: jnp.ndarray,
    mo: int,
    p_tile: int,
    s_cols: int,
    interpret: bool = False,
    sel: bool = False,
    locals_: jnp.ndarray | None = None,
    sel_init: int = 0,
    kf_thresh: float = 0.0,
    lokf: bool = False,
    kf_col: int = -1,
    amax: jnp.ndarray | None = None,
    yf: bool = False,
    i4: bool = False,
) -> jnp.ndarray:
    n_pad = origins.shape[0]
    if locals_ is None:
        locals_ = jnp.zeros((n_pad, 1), jnp.int32)
    n_tiles = n_pad // p_tile
    dr, dc = crop_dims(mo)
    if yf:
        rows = yf_buf_rows(mo)
        lanes = crop_cols_yf(mo) * 8 * C_PAD
        k = rows * lanes
        rxm = YF_RX
    elif i4:
        rows = dr
        lanes = crop_cols_i4(mo) * 4
        k = 2 * dr * trim_bytes_i4(mo)  # even | odd channel planes
        rxm = I4_RX
    else:
        rows = dr
        lanes = dc * C_PAD
        t = trim_lanes(mo)
        k = dr * t
        rxm = RX
        if m_var.shape[2] == dr * dc * C_PAD and t < dc * C_PAD:
            # legacy full-crop-layout M (the builders now emit dr*t
            # directly): drop the structurally-zero lane columns to
            # match the kernel's trimmed contraction (free: the dropped
            # amax contributions are zero, the hi/lo scales unchanged)
            n_var, s_m = m_var.shape[0], m_var.shape[1]
            m_var = m_var.reshape(n_var, s_m, dr, dc * C_PAD)[
                ..., :t
            ].reshape(n_var, s_m, k)
    assert m_var.shape[2] == k, (m_var.shape, yf, k)
    # hi/lo int8 split of M, stacked on the column axis: the kernel
    # contracts int8 crops against int8 [M_hi | M_lo] in ONE MXU pass
    # (2*s_cols columns fill the 128-lane MXU the 64-col bf16 matmul
    # half-wasted; int8 runs at 2x the bf16 rate) and combines the i32
    # accumulator halves with per-(variant, column) scales.  Effective
    # M precision is ~16 bit (residual <= amax/(127*254*2), BETTER than
    # the bf16 M it replaces): a single int8 plane is not enough - the
    # kf count column's coefficients span [1, kmax] collisions and a
    # 0.5/127*kmax rounding bias showed up as a +3% kf error.
    # one reduce pass (amax) + one quantize pass: operands are cast to
    # int8 INSIDE the concat so XLA fuses the whole elementwise chain
    # into the int8 concat write instead of materializing f32 hi/res/lo
    # copies of a table that reaches 321 MB on the K-bucket multi path
    # builders emit only the USED columns (tracked 34 of 64, init 82 of
    # 128: cost+norm+kf+lokf slot) - the build matmul's M dim shrinks
    # ~2x while the kernel keeps its full s_cols lane tiling; the
    # missing columns are padded HERE in the int8 domain (zero rows
    # contribute 0 to the accumulator regardless of scale)
    s_m = m_var.shape[1]
    pad_m = [(0, 0), (0, s_cols - s_m), (0, 0)]
    pad_s = [(0, 0), (0, s_cols - s_m)]
    m32 = m_var.astype(jnp.float32)
    if amax is None:
        amax = jnp.max(jnp.abs(m32), axis=-1)  # (n_var, s_m)
    else:
        # builder-supplied amax was reduced over the f32 y BEFORE the
        # bf16 cast (fused with the build's relayout pass; a standalone
        # reduce over the bf16 table measured ~4.5 ms at multi sizes);
        # inflate by (1 + 2^-8) > the bf16 rounding so every quantized
        # value stays within +-127 (the clips below never lose bits)
        amax = amax * np.float32(1.0 + 2.0 ** -8)
    s_hi = jnp.maximum(amax, 1e-30) / 127.0
    hi = jnp.clip(jnp.round(m32 / s_hi[..., None]), -127, 127)
    if lokf:
        # single plane: cost/norm columns are ~2500-term random-rounding
        # sums (RMS error ~0.02% of signal, within the map's own int8
        # quantization); only the kf column's lo residual is kept,
        # packed into column kf_col+1 (structurally zero in every M
        # layout: tracked 2*GW+1, init/multi 2*num_rot+1)
        res_kf = m32[:, kf_col] - hi[:, kf_col] * s_hi[:, kf_col, None]
        s_lo_kf = s_hi[:, kf_col] / 254.0
        lo_kf = jnp.clip(
            jnp.round(res_kf / s_lo_kf[:, None]), -127, 127
        )
        hi = hi.at[:, kf_col + 1].set(lo_kf)
        m_i8 = jnp.pad(hi.astype(jnp.int8), pad_m)
        m_scale = jnp.pad(
            s_hi.at[:, kf_col + 1].set(s_lo_kf), pad_s,
            constant_values=1.0,
        )[:, None, :]
        m_cols = s_cols
    else:
        s_lo = s_hi / 254.0
        lo = jnp.clip(  # residual |m32 - hi*s_hi| <= s_hi/2
            jnp.round((m32 - hi * s_hi[..., None]) / s_lo[..., None]),
            -127, 127,
        )
        m_i8 = jnp.concatenate(
            [jnp.pad(hi.astype(jnp.int8), pad_m),
             jnp.pad(lo.astype(jnp.int8), pad_m)], axis=1
        )
        m_scale = jnp.concatenate(
            [jnp.pad(s_hi, pad_s, constant_values=1.0),
             jnp.pad(s_lo, pad_s, constant_values=1.0)], axis=1
        )[:, None, :]  # (n_var, 1, 2*s_cols)
        m_cols = 2 * s_cols
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (p_tile, 4),
                lambda i, m: (i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(  # next tile's origins (for crop prefetch)
                (p_tile, 4),
                lambda i, m: (jnp.minimum(i + 1, n_tiles - 1), 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # M variants, manual DMA
            pl.BlockSpec(  # per-variant dequant row, auto-piped to VMEM
                (1, 1, m_cols),
                lambda i, m, _rxm=rxm: (
                    jnp.maximum(m[i], 0) // _rxm, 0, 0
                ),
            ),
            pl.BlockSpec(  # per-particle window column (sel mode)
                (p_tile, 1), lambda i, m: (i, 0)
            ),
        ],
        out_specs=pl.BlockSpec((p_tile, s_cols), lambda i, m: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, p_tile, rows, lanes), jnp.int8),
            pltpu.VMEM((m_cols, k), jnp.int8),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        )
    return pl.pallas_call(
        functools.partial(
            _kernel, mo=mo, p_tile=p_tile, s_cols=s_cols,
            interp=interpret, sel=sel, sel_init=sel_init,
            kf_thresh=kf_thresh, lokf=lokf, kf_col=kf_col, yf=yf,
            i4=i4,
        ),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n_pad, s_cols), jnp.float32),
        interpret=interpret,
        # the default 16 MB scoped-vmem budget caps p_tile at 64 for
        # mo=24; raising it lets the double-buffered crops + rolled
        # copy + resident M use real VMEM (v5e: 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(midx, origins, origins, stacked, m_i8, m_scale, locals_)


_COUNT_BLOCK = 512  # counting-layout block rows (any multiple works)


def _counting_pos(key: jnp.ndarray, n_groups: int,
                  p_tile: int | None = None):
    """Stable counting-sort rank of `key` via a blocked one-hot rank.

    Returns (pos (N,) int32, counts (G,) int32) where pos is the
    element's stable position in group-major order; with p_tile the
    group starts are tile-padded (empty groups consume no slots),
    without it they are the plain exclusive count cumsum (a stable
    sort).  Requires n % _COUNT_BLOCK == 0 and n_groups <= 256
    (one-hot materialization is n*G words).

    The within-block exclusive rank is a strict-lower-triangular bf16
    MXU matmul rather than a lax.cumsum: the log-step cumsum makes ~9
    full passes over the (n, G) one-hot in HBM while the matmul
    streams it once through the MXU (counts <= _COUNT_BLOCK are exact
    in the f32 accumulator)."""
    n = key.shape[0]
    nb = _COUNT_BLOCK
    b = n // nb
    k2 = key.reshape(b, nb)
    eq = k2[..., None] == jnp.arange(n_groups, dtype=key.dtype)
    ohb = eq.astype(jnp.bfloat16)  # (b, nb, G)
    ltri = jnp.tril(jnp.ones((nb, nb), jnp.bfloat16), -1)
    within = jax.lax.dot_general(
        ohb, ltri,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (b, G, nb): within[b, g, i] = #{j < i : key[b, j] == g}
    block_tot = (
        within[:, :, -1] + ohb[:, -1, :].astype(jnp.float32)
    ).astype(jnp.int32)  # (b, G) total per block
    block_off = jnp.cumsum(block_tot, axis=0) - block_tot
    counts = jnp.sum(block_tot, axis=0)  # (G,)
    if p_tile is not None:
        starts = _padded_starts(counts, p_tile)
    else:
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
    # fold starts[key] into the same one-hot contraction (avoids a
    # 102k-descriptor table gather)
    pos2d = (
        within.swapaxes(1, 2).astype(jnp.int32)
        + block_off[:, None, :]
        + starts[None, None, :]
    )  # (b, nb, G)
    pos = jnp.sum(jnp.where(eq, pos2d, 0), axis=-1).reshape(n)
    return pos, counts


def _padded_starts(counts: jnp.ndarray, p_tile: int):
    padded = jnp.where(
        counts > 0, ((counts + p_tile - 1) // p_tile) * p_tile, 0
    )
    return jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )


def _group_layout(key: jnp.ndarray, n_groups: int, p_tile: int):
    """Stable-group particles into per-group tile-padded slots.

    Returns (pos (N,) int32 slot per particle, tile_key (n_tiles,),
    n_pad static).  Empty groups consume NO slots (zero padding), so
    live tiles pack at the front and the tail tiles carry the -1
    sentinel - the kernel skips their crop DMA and matmul entirely
    (at K-bucket variant counts the unconditional per-key padding was
    ~2.7 GB/step of dead crop traffic).

    For small group counts the stable rank comes from a blocked one-hot
    cumsum (counting sort) instead of argsort: ~2 ms cheaper at 102,400
    particles on v5e (tests/profile_layout.py).  Group counts up to
    65536 (the K-bucket multi paths: K*N_GROUPS*RX = 1120 at K=10) run
    a two-pass LSD radix of the same blocked counting rank - XLA's
    sort at 102k plus the rank gathers cost several ms while each
    radix digit stays under the 256-group one-hot budget.  Both are
    exact-parity-tested against the argsort path (tests/test_trim.py)."""
    n = key.shape[0]
    n_pad = ((n + p_tile - 1) // p_tile + n_groups) * p_tile
    nb = _COUNT_BLOCK
    if n_groups <= 256 and n % nb == 0:
        # single pass: the padded group starts fold into the rank
        pos, _ = _counting_pos(key, n_groups, p_tile)
        keypad = jnp.full(n_pad, -1, jnp.int32).at[pos].set(key)
    elif n_groups <= 65536 and n % nb == 0:
        # two-pass LSD radix: stable counting rank by lo digit, permute,
        # stable counting rank by hi digit => full (hi, lo) = key order.
        import math

        b2 = 1 << max(1, (math.isqrt(n_groups - 1).bit_length()))
        g1 = -(-n_groups // b2)
        lo = jax.lax.rem(key, b2)
        hi = key // b2
        pos1, _ = _counting_pos(lo, b2)
        key_s = jnp.zeros(n, key.dtype).at[pos1].set(key)
        q_s, _ = _counting_pos(key_s // b2, g1)
        # per-full-key counts (exact small ints in f32): blocked
        # oh_hi^T @ oh_lo - the scatter-add bincount alternative
        # collision-serializes on TPU
        bb = n // nb
        oh_lo = (
            lo.reshape(bb, nb)[..., None]
            == jnp.arange(b2, dtype=key.dtype)
        ).astype(jnp.bfloat16)
        oh_hi = (
            hi.reshape(bb, nb)[..., None]
            == jnp.arange(g1, dtype=key.dtype)
        ).astype(jnp.bfloat16)
        counts2 = jnp.sum(
            jax.lax.dot_general(
                oh_hi, oh_lo,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ),
            axis=0,
        )  # (g1, b2)
        counts = counts2.reshape(g1 * b2).astype(jnp.int32)
        ustarts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        adj = _padded_starts(counts, p_tile) - ustarts  # (g1*b2,)
        # route q_s back to original index order with two distinct-slot
        # scatters (inv1 is a permutation), then add the pad adjustment
        inv1 = jnp.zeros(n, jnp.int32).at[pos1].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        q = jnp.zeros(n, jnp.int32).at[inv1].set(q_s)
        # adj[key] as a two-stage one-hot lookup instead of a 102k-
        # descriptor table gather (~0.6 ms at 1.7e8 desc/s): the f32
        # dot picks adj2[h, lo[i]] per (i, h) (single-term rows, exact
        # for adj < 2^24), the hi one-hot selects h = hi[i]
        adj2 = adj.reshape(g1, b2).astype(jnp.float32)
        t_lo = jax.lax.dot_general(
            oh_lo.astype(jnp.float32).reshape(n, b2),
            adj2,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n, g1) = adj2[:, lo[i]] per row
        adj_k = jnp.sum(
            jnp.where(
                hi[:, None] == jnp.arange(g1, dtype=key.dtype),
                t_lo,
                0.0,
            ),
            axis=1,
        ).astype(jnp.int32)
        pos = q + adj_k
        keypad = jnp.full(n_pad, -1, jnp.int32).at[pos].set(key)
    else:
        counts = jnp.bincount(key, length=n_groups)
        padded = jnp.where(
            counts > 0, ((counts + p_tile - 1) // p_tile) * p_tile, 0
        )
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(padded)[:-1].astype(jnp.int32)]
        )
        excl = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        order = jnp.argsort(key, stable=True)
        key_sorted = key[order]
        rank = jnp.arange(n, dtype=jnp.int32) - excl[key_sorted]
        pos_sorted = starts[key_sorted] + rank
        pos = jnp.zeros(n, jnp.int32).at[order].set(pos_sorted)
        keypad = jnp.full(n_pad, -1, jnp.int32).at[pos_sorted].set(
            key_sorted
        )
    n_tiles = n_pad // p_tile
    tile_key = jnp.max(keypad.reshape(n_tiles, p_tile), axis=1)
    return pos, tile_key, n_pad


def _origins(
    center_px: jnp.ndarray,
    maps: PaddedMaps,
    mo: int,
    map_resolution: float,
):
    """Crop origin decomposition.  Returns (ry, y8, xe, rx, in_range).

    y-folded maps: ry is the 64-copy index (y0%8)*8 + (y0//8)%8, y8
    the aligned folded-row start / 8 (the kernel multiplies by 8,
    proving Mosaic's sublane alignment), rx the 2-px x residual, xe
    the 128-lane (= 2 px) aligned lane-tile start."""
    dr, dc = crop_dims(mo)
    pad = maps.pad
    cy = jnp.round(center_px[:, 1] / map_resolution).astype(jnp.int32)
    cx = jnp.round(center_px[:, 0] / map_resolution).astype(jnp.int32)
    y0 = cy - dr // 2 + pad
    if maps.yf:
        dc = crop_cols_yf(mo)
        x0 = cx - (mo + 1) + pad
    elif maps.i4:
        dc = crop_cols_i4(mo)
        x0 = cx - (mo + 1) + pad
    else:
        x0 = cx - (dc - 16) // 2 + pad
    in_range = (
        (y0 >= 0)
        & (y0 <= maps.hp - dr)
        & (x0 >= 0)
        & (x0 <= maps.wp - dc)
    )
    y0c = jnp.where(in_range, y0, 0)
    x0c = jnp.where(in_range, x0, 0)
    ry = y0c % 8
    y8 = (y0c - ry) // 8  # row-major: kernel multiplies by 8
    if maps.yf:
        # copy (k, d) holds rows [k+8d, ...) folded: d consumes the
        # folded-row residual so the DMA start 8*(y8//8) is aligned
        ry = ry * 8 + y8 % 8
        y8 = y8 // 8
        rx = x0c % YF_RX
        xe = (x0c - rx) // 2  # 128-lane tiles of 64 lanes/px
    elif maps.i4:
        rx = x0c % I4_RX
        xe = (x0c - rx) // 32  # 128-lane tiles of 4 bytes/px
    else:
        rx = x0c % RX
        xe = (x0c - rx) * C_PAD // 128  # kernel multiplies by 128
    return ry, y8, xe, rx, in_range


def make_score_tracked(mo: int, map_resolution: float = 1.0,
                       interpret: bool = False):
    """Returns a tracked-mode scorer specialized on the crop bucket."""

    def score(maps, stencil, scan, class_weights, center_px, theta, f):
        th, r, _ = stencil.shape
        p_tile = tracked_p_tile(mo)
        rxm = YF_RX if maps.yf else (I4_RX if maps.i4 else RX)
        m_var, m_amax = build_m_tracked(
            scan, class_weights, stencil, f, mo, maps.qinv,
            with_amax=True, yf=maps.yf, i4=maps.i4,
        )
        s = rotation_shift(theta, th)
        g = s // GW
        ry, y8, xe, rx, in_range = _origins(
            center_px, maps, mo, map_resolution
        )
        # variant(g)-major key: same-variant tiles run contiguously and
        # the kernel derives (variant, rx) = divmod(key, rxm)
        key = (g * rxm + rx).astype(jnp.int32)
        pos, tile_midx, n_pad = _group_layout(
            key, rxm * N_GROUPS, p_tile
        )
        origins = jnp.zeros((n_pad, 4), jnp.int32)
        origins = origins.at[pos].set(
            jnp.stack([ry, y8, xe, jnp.zeros_like(ry)], axis=-1)
        )
        # the kernel selects each particle's (cost, norm, kf) window
        # column itself (sel=True) and the readback is DISTINCT-slot
        # scatters: three 102k-descriptor gathers cost ~0.6 ms each on
        # TPU while distinct scatters are ~free (CLAUDE.md measured)
        n = center_px.shape[0]
        local = s - g * GW
        loc_pad = jnp.zeros((n_pad, 1), jnp.int32).at[pos, 0].set(local)
        out = _run_kernel(
            maps.stacked, origins, tile_midx, m_var, mo, p_tile, 64,
            interpret, sel=True, locals_=loc_pad, lokf=not m_hilo(),
            kf_col=2 * GW, amax=m_amax, yf=maps.yf, i4=maps.i4,
        )
        inv = jnp.full((n_pad,), n, jnp.int32).at[pos].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        cost = jnp.zeros(n, jnp.float32).at[inv].set(
            out[:, 0], mode="drop"
        )
        norm = jnp.zeros(n, jnp.float32).at[inv].set(
            out[:, 1], mode="drop"
        )
        kf_cnt = jnp.zeros(n, jnp.float32).at[inv].set(
            out[:, 2], mode="drop"
        )
        kf = jnp.where(in_range, kf_cnt / (th * r), 0.0)
        cost = jnp.where(in_range, cost, 0.0)
        norm = jnp.where(in_range, norm, 0.0)
        return cost, norm, kf

    return score


def make_score_init(mo: int, num_rot: int = 40,
                    map_resolution: float = 1.0,
                    interpret: bool = False, sel: bool = False):
    """Returns a theta-search scorer specialized on the crop bucket.

    sel=False: returns (costs (N, num_rot), norms (N, num_rot), kf (N,))
    via an (n_pad, 128) row gather — the parity surface.
    sel=True: the kernel folds the select_init_cost epilogue
    (state_particle.cpp:195-206) in and the readback is distinct-slot
    scatters; returns (best_cost (N,), best_theta (N,), kf (N,)) with
    out-of-range rows pinned to (FLT_MAX, 0, 0) exactly as the
    sel=False path's 0/0=NaN -> FLT_MAX plumbing would produce."""

    def score(maps, stencil, scan, class_weights, center_px, f):
        th, r, _ = stencil.shape
        p_tile = init_p_tile(mo)
        rxm = YF_RX if maps.yf else (I4_RX if maps.i4 else RX)
        m_var, m_amax = build_m_init(
            scan, class_weights, stencil, f, mo, num_rot, maps.qinv,
            with_amax=True, yf=maps.yf, i4=maps.i4,
        )
        ry, y8, xe, rx, in_range = _origins(
            center_px, maps, mo, map_resolution
        )
        pos, tile_midx, n_pad = _group_layout(
            rx.astype(jnp.int32), rxm, p_tile
        )
        origins = jnp.zeros((n_pad, 4), jnp.int32)
        origins = origins.at[pos].set(
            jnp.stack([ry, y8, xe, jnp.zeros_like(ry)], axis=-1)
        )
        lokf = not m_hilo()
        out = _run_kernel(
            maps.stacked, origins, tile_midx, m_var, mo, p_tile, 128,
            interpret, sel_init=(num_rot if sel else 0),
            kf_thresh=0.5 * th * r, lokf=lokf, kf_col=2 * num_rot,
            amax=m_amax, yf=maps.yf, i4=maps.i4,
        )
        if sel:
            n = center_px.shape[0]
            inv = jnp.full((n_pad,), n, jnp.int32).at[pos].set(
                jnp.arange(n, dtype=jnp.int32)
            )
            best = jnp.zeros(n, jnp.float32).at[inv].set(
                out[:, 0], mode="drop"
            )
            bk = jnp.zeros(n, jnp.float32).at[inv].set(
                out[:, 1], mode="drop"
            )
            kf_cnt = jnp.zeros(n, jnp.float32).at[inv].set(
                out[:, 2], mode="drop"
            )
            flt_max = float(np.finfo(np.float32).max)
            best = jnp.where(in_range, best, flt_max)
            bk = jnp.where(in_range, bk, 0.0)
            kf = jnp.where(in_range, kf_cnt / (th * r), 0.0)
            best_theta = bk * (2.0 * np.pi / num_rot)
            return best, best_theta, kf
        rows = out[pos]
        costs = rows[:, :num_rot]
        norms = rows[:, num_rot : 2 * num_rot]
        kf_cnt = rows[:, 2 * num_rot]  # init mode: row gather is needed
        if lokf:
            kf_cnt = kf_cnt + rows[:, 2 * num_rot + 1]
        kf = jnp.where(in_range, kf_cnt / (th * r), 0.0)
        costs = jnp.where(in_range[:, None], costs, 0.0)
        norms = jnp.where(in_range[:, None], norms, 0.0)
        return costs, norms, kf

    return score


def score_tracked_fast_mo(
    maps, stencil, scan, class_weights, center_px, theta, f, mo,
    map_resolution=1.0, interpret=False,
):
    return make_score_tracked(mo, map_resolution, interpret)(
        maps, stencil, scan, class_weights, center_px, theta, f
    )


def score_init_fast_mo(
    maps, stencil, scan, class_weights, center_px, f, mo,
    num_rot=40, map_resolution=1.0, interpret=False,
):
    return make_score_init(mo, num_rot, map_resolution, interpret)(
        maps, stencil, scan, class_weights, center_px, f
    )


def score_init_sel_mo(
    maps, stencil, scan, class_weights, center_px, f, mo,
    num_rot=40, map_resolution=1.0, interpret=False,
):
    """In-kernel argmin init scorer: (best_cost, best_theta, kf)."""
    return make_score_init(
        mo, num_rot, map_resolution, interpret, sel=True
    )(maps, stencil, scan, class_weights, center_px, f)
