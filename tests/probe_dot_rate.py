"""XLA-level dot-rate probe at the crop-kernel contraction shape.

The Pallas crop kernel's per-tile dot is (p_tile, K) @ (K, 128) int8
with K = dr*dc*8 (35,840 at mo=24).  This measures what XLA itself
achieves for the SAME total contraction as one big matmul, in int8 and
bf16, at several row-block sizes - the efficiency ceiling for the
in-kernel dot.

Run: python tests/probe_dot_rate.py  (TPU)
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

K = int(os.environ.get("PR_K", str(56 * 80 * 8)))
N = int(os.environ.get("PR_N", "109568"))
NC = int(os.environ.get("PR_NC", "128"))


def bench(fn, *args):
    """Chained in-jit loop: each iteration perturbs the weights with a
    value derived from the previous output, so XLA can neither hoist
    the dot out of the loop nor overlap iterations (the original
    dispatch-loop harness produced physically impossible rates - 5 TB/s
    of LHS reads - on the axon backend)."""
    reps = 8

    @jax.jit
    def run(a, m):
        def body(i, carry):
            acc, bump = carry
            out = fn(a, m ^ bump if m.dtype == jnp.int8 else m + bump)
            # consume via min: no algebraic shortcut exists (slicing or
            # sum-reassociation both let XLA skip the full matmul)
            s = out.min()
            if m.dtype == jnp.int8:
                nb = ((s >> 31) & 1).astype(jnp.int8)
            else:
                nb = jnp.isnan(s).astype(m.dtype)
            return acc + s.astype(jnp.float32), nb

        z = jnp.zeros((), m.dtype)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), z))
        return acc

    # float() forces a device->host read: on the axon remote backend
    # block_until_ready returns before execution finishes
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (N, K), dtype=np.int8))
    m8 = jnp.asarray(rng.integers(-127, 127, (K, NC), dtype=np.int8))
    abf = a8.astype(jnp.bfloat16)
    mbf = m8.astype(jnp.bfloat16)
    jax.block_until_ready((a8, m8, abf, mbf))

    flops = 2 * N * K * NC
    for name, a, m, pe in (
        ("int8->i32", a8, m8, jnp.int32),
        ("bf16->f32", abf, mbf, jnp.float32),
    ):
        dt = bench(
            lambda a, m: jax.lax.dot_general(
                a, m, (((1,), (0,)), ((), ())), preferred_element_type=pe
            ),
            a, m,
        )
        # dt is in ms: flops/dt/1e9 = TFLOP/s
        print(f"{name:10s} {dt:8.2f} ms  {flops/dt/1e9:8.1f} TFLOP/s")


if __name__ == "__main__":
    main()
