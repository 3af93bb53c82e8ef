"""Hardware probe: crop-DMA descriptor cost - strided rows vs y-folded.

The spread-regime crop kernel moves ~102k crops x 56 rows x 640 B per
step.  If the DMA engine is row-descriptor-bound, those 5.7M short rows
per step dominate the kernel regardless of matmul optimizations.  This
probe times three fetch geometries over the same map bytes:

  A (today): one strided 2-D DMA per crop, (56 rows, 640 B) from the
     row-major stacked map.
  B (folded 2-slice): 8 map rows folded into the minor dim; fetch TWO
     aligned (8, 5120 B) slices per crop (the folded rows covering an
     arbitrary y sit astride an 8-aligned block boundary) -> 2.3x the
     bytes but ~2 fat contiguous descriptors instead of 56 short rows.
  C (folded aligned): ONE aligned (8, 5120 B) slice per crop - the
     geometry a 64-y-copy stack buys (exact fetch, 1.14x bytes).

Mosaic constraint note: HBM int8 memrefs carry (8,128)(4,1) tiling -
sublane slice starts AND heights must be multiples of 8 (a single-row
dynamic slice fails to compile), which is why B/C fetch 8-row blocks.

Run on the real chip:  python tests/probe_dma_fold.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DR, DCB = 56, 640  # crop rows x row bytes (mo=24, int8)
K = DR * DCB  # 35840
DCF = DCB * 8  # folded row bytes: 5120
P_TILE = 64
N = 102400
H, WB = 1280, 1280 * 8  # map rows x row bytes (~1024 + pad, int8)


def _kernel_a(dummy_ref, origins_ref, src_ref, out_ref, buf, sem):
    def dma(i):
        return pltpu.make_async_copy(
            src_ref.at[
                pl.ds(origins_ref[i, 0] * 8, DR),
                pl.ds(origins_ref[i, 1] * 128, DCB),
            ],
            buf.at[i],
            sem,
        )

    for i in range(P_TILE):
        dma(i).start()
    # one batched wait for the tile's total DMA bytes
    pltpu.make_async_copy(buf, buf, sem).wait()
    out_ref[...] = buf[:, 0, :128].astype(jnp.float32)


def _kernel_fold(dummy_ref, origins_ref, src_ref, out_ref, buf, sem, *, nsl):
    def dma(i, j):
        return pltpu.make_async_copy(
            src_ref.at[
                pl.ds((origins_ref[i, 0] + j) * 8, 8),
                pl.ds(origins_ref[i, 1] * 128, DCF),
            ],
            buf.at[i, pl.ds(j * 8, 8)],
            sem,
        )

    for i in range(P_TILE):
        for j in range(nsl):
            dma(i, j).start()
    pltpu.make_async_copy(buf, buf, sem).wait()
    out_ref[...] = buf[:, 0, :128].astype(jnp.float32)


def _kernel_db(dummy_ref, origins_ref, origins_next_ref, src_ref,
               out_ref, buf, sems):
    """Clone of the real kernel's double-buffered prefetch structure
    (tile i+1's crop DMAs issued during tile i, batched per-slot wait)
    with the compute replaced by a trivial slice copy - isolates the
    steady-state DMA cost the way _run_kernel actually overlaps it."""
    import jax.lax as lax
    i_tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    slot = lax.rem(i_tile, 2)
    nslot = lax.rem(i_tile + 1, 2)

    def dma(oref, i, sl):
        return pltpu.make_async_copy(
            src_ref.at[
                pl.ds(oref[i, 0] * 8, DR),
                pl.ds(oref[i, 1] * 128, DCB),
            ],
            buf.at[sl, i],
            sems.at[sl],
        )

    @pl.when(i_tile == 0)
    def _():
        for i in range(P_TILE):
            dma(origins_ref, i, slot).start()

    @pl.when(i_tile + 1 < n_tiles)
    def _():
        for i in range(P_TILE):
            dma(origins_next_ref, i, nslot).start()

    pltpu.make_async_copy(
        buf.at[slot], buf.at[slot], sems.at[slot]
    ).wait()
    out_ref[...] = buf[slot, :, 0, :128].astype(jnp.float32)


def run_d(src, origins):
    n_tiles = N // P_TILE
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (P_TILE, 2), lambda i, d: (i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (P_TILE, 2),
                lambda i, d: (jnp.minimum(i + 1, n_tiles - 1), 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((P_TILE, 128), lambda i, d: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, P_TILE, DR, DCB), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _kernel_db,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
    )(jnp.zeros(1, jnp.int32), origins, origins, src)


def _run(kernel, buf_shape, src, origins):
    n_tiles = N // P_TILE
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (P_TILE, 2),
                lambda i, d: (i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((P_TILE, 128), lambda i, s: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM(buf_shape, jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
    )(jnp.zeros(1, jnp.int32), origins, src)


run_a = functools.partial(_run, _kernel_a, (P_TILE, DR, DCB))
run_b = functools.partial(
    _run,
    functools.partial(_kernel_fold, nsl=2),
    (P_TILE, 16, DCF),
)
run_c = functools.partial(
    _run,
    functools.partial(_kernel_fold, nsl=1),
    (P_TILE, 8, DCF),
)


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(-100, 100, (H, WB), dtype=np.int8)
    src8 = src.reshape(H // 8, 8 * WB)
    ys = rng.integers(0, (H - DR) // 8, N).astype(np.int32)
    xs = rng.integers(0, (WB - DCB) // 128, N).astype(np.int32)
    orig_a = jnp.asarray(np.stack([ys, xs], 1))
    # folded: slice starts at 8-aligned folded rows
    ys_f = rng.integers(0, H // 64 - 2, N).astype(np.int32)
    xs_f = rng.integers(0, (8 * WB - DCF) // 128, N).astype(np.int32)
    orig_f = jnp.asarray(np.stack([ys_f, xs_f], 1))
    sa = jnp.asarray(src)
    sb = jnp.asarray(src8)

    out_c = np.asarray(run_c(sb, orig_f))
    for i in range(8):
        y0, x0 = int(ys_f[i]) * 8, int(xs_f[i]) * 128
        ref = src8[y0, x0 : x0 + 128].astype(np.float32)
        assert np.array_equal(out_c[i], ref), f"C mismatch @{i}"
    out_a = np.asarray(run_a(sa, orig_a))
    for i in range(8):
        y0, x0 = int(ys[i]) * 8, int(xs[i]) * 128
        ref = src[y0, x0 : x0 + 128].astype(np.float32)
        assert np.array_equal(out_a[i], ref), f"A mismatch @{i}"
    print("A+C value parity: OK")

    for name, fn, s, o, nbytes in (
        ("A strided 56 x 640B", run_a, sa, orig_a, K),
        ("D strided w/ prefetch", run_d, sa, orig_a, K),
        ("B folded 2 x (8,5120B)", run_b, sb, orig_f, 16 * DCF),
        ("C folded 1 x (8,5120B)", run_c, sb, orig_f, 8 * DCF),
    ):
        jf = jax.jit(fn)
        r = jf(s, o)
        r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            r = jf(s, o)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        gb = N * nbytes / 1e9
        print(
            f"{name}: {dt*1e3:7.2f} ms  "
            f"({gb:.2f} GB moved, {gb/dt:6.1f} GB/s effective)"
        )


if __name__ == "__main__":
    main()
