"""Hardware probe: can a Pallas manual DMA slice an HBM int8 array at
an UNALIGNED sublane (second-minor) start?

The crop kernel's stacked-map trick keeps y starts 8-aligned (8
row-shifted copies).  A y-folded layout (8 map rows folded into the
minor dim -> 8x fewer DMA row descriptors per crop) needs folded-row
starts at ARBITRARY sublane offsets; this probe checks Mosaic accepts
that for an HBM source with a tile-aligned VMEM destination, for both
int8 and bf16, with the start coming from SMEM-prefetched scalars.

Run on the real chip:  python tests/probe_dma_unaligned.py
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 1024  # W = 8 * 128 lanes
DR = 8  # rows per copy


def _kernel(starts_ref, src_ref, out_ref, buf, sem, *, n):
    i = pl.program_id(0)
    y0 = starts_ref[i]
    pltpu.make_async_copy(
        src_ref.at[pl.ds(y0, DR), :], buf, sem
    ).start()
    pltpu.make_async_copy(
        src_ref.at[pl.ds(y0, DR), :], buf, sem
    ).wait()
    out_ref[...] = buf[...].reshape(out_ref.shape)


def run(dtype):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        src = rng.integers(-127, 128, (H, W), dtype=np.int8)
    else:
        src = rng.standard_normal((H, W)).astype(jnp.bfloat16)
    starts = np.array([0, 1, 3, 7, 9, 17, 30, 101], np.int32)
    n = len(starts)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, DR, W), lambda i, s: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((DR, W), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n=n),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n, DR, W), dtype),
    )(jnp.asarray(starts), jnp.asarray(src))
    out = np.asarray(out)
    for j, s in enumerate(starts):
        ref = np.asarray(src[s : s + DR])
        assert np.array_equal(out[j], ref), (
            f"{dtype} mismatch at start {s}"
        )
    print(f"unaligned sublane DMA start: OK for {dtype}")


if __name__ == "__main__":
    run(jnp.int8)
    run(jnp.bfloat16)
    print("device:", jax.devices()[0])
