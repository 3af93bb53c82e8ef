"""Probe Mosaic DMA slice alignment constraints on HBM refs."""
import os, sys
sys.path.insert(0, "/root/repo")
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 1024
D = 64

def kern(orig_ref, src_ref, out_ref, buf, sem, *, ymul, xmul):
    y0 = orig_ref[0, 0] * ymul
    x0 = orig_ref[0, 1] * xmul
    cp = pltpu.make_async_copy(
        src_ref.at[pl.ds(y0, D), pl.ds(x0, 512)], buf, sem)
    cp.start(); cp.wait()
    out_ref[...] = jnp.sum(buf[...].astype(jnp.float32)).reshape(1, 1)

def run(ymul, xmul, ytag, xtag):
    src = jnp.asarray(np.random.rand(H, W), jnp.bfloat16)
    orig = jnp.asarray([[3, 1]], jnp.int32)
    try:
        out = pl.pallas_call(
            functools.partial(kern, ymul=ymul, xmul=xmul),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((D, 512), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        )(orig, src)
        jax.block_until_ready(out)
        print(f"y:{ytag} x:{xtag} -> OK", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"y:{ytag} x:{xtag} -> FAIL {msg}", flush=True)

run(8, 128, "x8", "x128")
run(1, 128, "free", "x128")
run(8, 1, "x8", "free")
run(16, 256, "x16", "x256")
run(1, 1, "free", "free")
