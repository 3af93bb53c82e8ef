"""Probe: (1) dynamic dim-0 index in DMA src on a stacked map,
(2) scalar-prefetch-driven M block selection."""
import os, sys
sys.path.insert(0, "/root/repo")
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, D = 128, 1024, 64

# --- probe 1: stacked dynamic dim0 ---
def kern1(orig_ref, src_ref, out_ref, buf, sem):
    k = orig_ref[0, 0]
    y0 = orig_ref[0, 1] * 8
    x0 = orig_ref[0, 2] * 128
    cp = pltpu.make_async_copy(
        src_ref.at[k, pl.ds(y0, D), pl.ds(x0, 512)], buf, sem)
    cp.start(); cp.wait()
    out_ref[...] = jnp.sum(buf[...].astype(jnp.float32)).reshape(1, 1)

src = jnp.asarray(np.arange(8 * H * W).reshape(8, H, W) % 1000, jnp.bfloat16)
orig = jnp.asarray([[3, 2, 1]], jnp.int32)
try:
    out = pl.pallas_call(
        kern1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, 512), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(orig, src)
    ref = np.asarray(src[3, 16:16+D, 128:128+512], np.float32).sum()
    print("probe1 dynamic dim0 DMA: OK, match:",
          abs(float(out[0, 0]) - ref) < ref * 1e-2, flush=True)
except Exception as e:
    print("probe1 FAIL:", str(e).split("\n")[0][:120], flush=True)

# --- probe 2: scalar-prefetch M block select ---
KV, SC = 256, 128
def kern2(midx_ref, x_ref, m_ref, out_ref):
    out_ref[...] = jnp.dot(x_ref[...], m_ref[0],
                           preferred_element_type=jnp.float32)

mvar = jnp.asarray(np.stack([np.full((KV, SC), v, np.float32)
                             for v in range(4)]), jnp.bfloat16)
x = jnp.ones((4 * 8, KV), jnp.bfloat16)
midx = jnp.asarray([2, 0, 3, 1], jnp.int32)
try:
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4,),
        in_specs=[
            pl.BlockSpec((8, KV), lambda i, m: (i, 0)),
            pl.BlockSpec((1, KV, SC), lambda i, m: (m[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, SC), lambda i, m: (i, 0)),
    )
    out = pl.pallas_call(
        kern2, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((32, SC), jnp.float32),
    )(midx, x, mvar)
    got = np.asarray(out)[::8, 0] / KV
    print("probe2 scalar-prefetch M select: OK, vals:", got, flush=True)
except Exception as e:
    print("probe2 FAIL:", str(e).split("\n")[0][:120], flush=True)
