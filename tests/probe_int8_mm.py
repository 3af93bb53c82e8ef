"""Hardware probe: int8 x int8 MXU matmul inside a Pallas TPU kernel.

Validates that Mosaic lowers jax.lax.dot_general(int8, int8,
preferred_element_type=int32) — the contraction the crop kernel uses to
skip the int8->bf16 convert pass and run the MXU at its 2x int8 rate.

Run on the real chip:  python tests/probe_int8_mm.py
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...],
        b_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def main():
    m, k, n = 128, 1024, 64
    rng = np.random.default_rng(0)
    a = rng.integers(-127, 128, (m, k), dtype=np.int8)
    b = rng.integers(-127, 128, (n, k), dtype=np.int8)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
    )(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(np.int64) @ b.astype(np.int64).T
    got = np.asarray(out).astype(np.int64)
    print("max abs err:", np.max(np.abs(ref - got)))
    assert np.array_equal(ref, got), "int8 matmul mismatch"
    print("int8 x int8 -> int32 MXU matmul: OK on", jax.devices()[0])


if __name__ == "__main__":
    main()
