"""Dev probe: int8 DMA alignment + bitcast lane-rotate ON REAL TPU.

Feasibility probe for the int8 crop path (halving crop DMA traffic,
CLAUDE.md perf backlog):
  1. Can Mosaic start an int8 HBM->VMEM DMA slice at (8, 128)-aligned
     offsets (like bf16), or does int8's (32, 128) tiling force 32
     y-shifted map copies?
  2. Does the i32-bitcast dynamic lane rotate (the bf16 x-residual
     trick, pallas_score._kernel) extend to int8 (4 sublanes packed per
     word, lane indices preserved)?
  3. Value parity of int8 crop -> rotate -> bf16 convert -> matmul.

Run: python tests/probe_int8.py  (TPU)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

DR, DC8 = 56, 640  # mo=24 crop dims


def probe_dma(ymul, ytag):
    """Copy an int8 slice starting at y0 = 3*ymul, x0 = 128."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = 256, 2048
    rng = np.random.default_rng(0)
    src_np = rng.integers(-128, 128, (H, W)).astype(np.int8)
    src = jnp.asarray(src_np)
    orig = jnp.asarray([[3, 1]], jnp.int32)

    def kern(orig_ref, src_ref, out_ref, buf, sem):
        y0 = orig_ref[0, 0] * ymul
        x0 = orig_ref[0, 1] * 128
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(y0, DR), pl.ds(x0, DC8)], buf, sem
        )
        cp.start()
        cp.wait()
        out_ref[...] = buf[...]

    try:
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((DR, DC8), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((DR, DC8), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((DR, DC8), jnp.int8),
                pltpu.SemaphoreType.DMA,
            ],
        )(orig, src)
        got = np.asarray(out)
        want = src_np[3 * ymul : 3 * ymul + DR, 128 : 128 + DC8]
        ok = np.array_equal(got, want)
        print(f"dma y:{ytag} -> {'OK' if ok else 'WRONG VALUES'}", flush=True)
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"dma y:{ytag} -> FAIL {msg}", flush=True)
        return False


def probe_rotate():
    """int8 (DR, DC8) buf: bitcast->i32 dynamic lane roll == per-row
    int8 roll along the last axis?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    src_np = rng.integers(-128, 128, (DR, DC8)).astype(np.int8)
    src = jnp.asarray(src_np)

    for rx in (0, 3, 11):
        rx8 = rx * 8

        def kern(src_ref, out_ref):
            ci = pltpu.bitcast(src_ref[...], jnp.int32)
            rolled = pltpu.bitcast(
                pltpu.roll(ci, jax.lax.rem(DC8 - rx8, DC8), 1), jnp.int8
            )
            out_ref[...] = rolled

        try:
            out = pl.pallas_call(
                kern,
                grid=(1,),
                in_specs=[pl.BlockSpec((DR, DC8), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((DR, DC8), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((DR, DC8), jnp.int8),
            )(src)
            got = np.asarray(out)
            want = np.roll(src_np, -(rx8), axis=1)
            ok = np.array_equal(got, want)
            print(f"rotate rx={rx} -> {'OK' if ok else 'WRONG'}", flush=True)
            if not ok and rx == 3:
                # diagnose: what permutation did we get?
                print("  got[0,:16] ", got[0, :16])
                print("  want[0,:16]", want[0, :16])
        except Exception as e:
            print(f"rotate rx={rx} -> FAIL {str(e).splitlines()[0][:140]}",
                  flush=True)


def probe_convert_matmul():
    """int8 crop -> bf16 convert -> matmul parity + a rough timing of
    the convert (the VPU cost int8 adds to the kernel's hot loop)."""
    import time

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = 48
    rng = np.random.default_rng(2)
    crop_np = rng.integers(0, 127, (P, DR * DC8)).astype(np.int8)
    m_np = (rng.random((64, DR * DC8)) - 0.5).astype(np.float32)

    def kern(crop_ref, m_ref, out_ref):
        out_ref[...] = jax.lax.dot_general(
            crop_ref[...].astype(jnp.bfloat16),
            m_ref[...],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((P, DR * DC8), lambda i: (0, 0)),
            pl.BlockSpec((64, DR * DC8), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((P, 64), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, 64), jnp.float32),
    )(jnp.asarray(crop_np), jnp.asarray(m_np, jnp.bfloat16))
    got = np.asarray(out)
    want = crop_np.astype(np.float32) @ m_np.astype(np.float32).T
    rel = np.abs(got - want) / (np.abs(want) + 1e3)
    print(f"convert+matmul max rel err {rel.max():.4f}", flush=True)


if __name__ == "__main__":
    probe_dma(8, "x8")
    probe_dma(32, "x32")
    probe_rotate()
    probe_convert_matmul()
