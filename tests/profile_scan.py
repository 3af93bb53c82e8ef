"""1-D scan formulations at particle count: cumsum / cummax are the
measured resample bottleneck (1.95 + 1.88 ms at 102,400 on v5e via
XLA's log-step lowering of the tiled 1-D layout).

Candidates:
  - 1d:        jnp.cumsum / lax.cummax on the flat (N,) array.
  - rows:      reshape (B, nb), scan along the minor (lane) axis, add
               exclusive block offsets (the offsets are a B-length 1-D
               scan - recursively cheap).
  - cols:      reshape (nb, B), scan along the major (sublane) axis -
               log-steps become sublane shifts.
  - mm:        within-block inclusive prefix as a triangular matmul
               (the _counting_pos trick): f32 weights directly; int32
               split into three 7-bit planes for exact int8 MXU sums.
  - delta-j:   the full gather-free systematic-index pipeline (segment
               deltas + one int cumsum) vs the scatter+cummax baseline.

Run: python tests/profile_scan.py
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

N = int(os.environ.get("BENCH_N", 102400))
NB = 512
B = N // NB


def timeit(name, f, *args, reps=30):
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])  # fence (axon early-return)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt * 1000:9.3f} ms", flush=True)
    return out


def cumsum_rows(x):
    x2 = x.reshape(B, NB)
    within = jnp.cumsum(x2, axis=1)
    tot = within[:, -1]
    off = jnp.cumsum(tot) - tot
    return (within + off[:, None]).reshape(N)


def cumsum_cols(x):
    x2 = x.reshape(B, NB).T  # (NB, B)
    within = jnp.cumsum(x2, axis=0)
    tot = within[-1]
    off = jnp.cumsum(tot) - tot
    return (within + off[None, :]).T.reshape(N)


def cumsum_mm_f32(x):
    x2 = x.reshape(B, NB)
    ut = jnp.triu(jnp.ones((NB, NB), jnp.float32))
    within = jax.lax.dot_general(
        x2, ut, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tot = within[:, -1]
    off = jnp.cumsum(tot) - tot
    return (within + off[:, None]).reshape(N)


def cumsum_mm_i32(x):
    """Exact int32 cumsum: three 7-bit planes through the int8 MXU."""
    x2 = x.reshape(B, NB)
    mn = jnp.min(x2)
    u = (x2 - mn).astype(jnp.int32)  # >= 0, <= 2^21 for |x| <= 1e6
    ut = jnp.triu(jnp.ones((NB, NB), jnp.int8))
    acc = jnp.zeros((B, NB), jnp.int32)
    for k in range(3):
        plane = ((u >> (7 * k)) & 127).astype(jnp.int8)
        pk = jax.lax.dot_general(
            plane, ut, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + (pk << (7 * k))
    idx1 = jnp.arange(1, NB + 1, dtype=jnp.int32)
    within = acc + mn * idx1[None, :]
    tot = within[:, -1]
    off = jnp.cumsum(tot) - tot
    return (within + off[:, None]).reshape(N)


def cummax_cols(x):
    x2 = x.reshape(B, NB).T
    within = jax.lax.cummax(x2, axis=0)
    tot = within[-1]
    off = jax.lax.cummax(tot)
    prev = jnp.concatenate([jnp.full(1, x2.dtype.type(-(2**31))), off[:-1]])
    return jnp.maximum(within, prev[None, :]).T.reshape(N)


# --- systematic-index pipelines ----------------------------------------


def idx_baseline(weights, shift, cumsum=jnp.cumsum, cummax=jax.lax.cummax):
    n = weights.shape[0]
    csum = cumsum(weights)
    nn = jnp.float32(n)
    f = jnp.clip(jnp.ceil(csum * nn - shift), 0.0, nn).astype(jnp.int32)
    f_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), f[:-1]])
    has = f > f_prev
    src = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.where(has, f_prev, n)
    seg = jnp.zeros(n, jnp.int32).at[pos].max(src, mode="drop")
    return cummax(seg)


def idx_delta(weights, shift, cumsum=jnp.cumsum, icumsum=jnp.cumsum):
    """Gather- and cummax-free: selected segments [f_prev, f) are
    disjoint and cover [0, n), so scattering +src at starts and -src at
    ends (both DISTINCT position sets) and prefix-summing yields the
    per-slot source index directly."""
    n = weights.shape[0]
    csum = cumsum(weights)
    nn = jnp.float32(n)
    f = jnp.clip(jnp.ceil(csum * nn - shift), 0.0, nn).astype(jnp.int32)
    f_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), f[:-1]])
    has = f > f_prev
    src = jnp.arange(n, dtype=jnp.int32)
    pos1 = jnp.where(has, f_prev, n)
    pos2 = jnp.where(has, f, n)  # strictly increasing over selected
    d = (
        jnp.zeros(n, jnp.int32)
        .at[pos1].add(src, mode="drop")
        .at[pos2].add(-src, mode="drop")
    )
    return icumsum(d)


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random(N).astype(np.float32))
    w = w / jnp.sum(w)
    xi = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    xs = jnp.asarray(np.maximum.accumulate(
        np.where(rng.random(N) < 0.3, rng.integers(0, N, N), 0)
    ).astype(np.int32))
    shift = jnp.float32(0.37)

    print(f"[N={N} blocks {B}x{NB}]")
    r0 = timeit("cumsum 1d f32", jax.jit(jnp.cumsum), w)
    for name, fn in (
        ("cumsum rows f32", cumsum_rows),
        ("cumsum cols f32", cumsum_cols),
        ("cumsum mm f32", cumsum_mm_f32),
    ):
        r = timeit(name, jax.jit(fn), w)
        err = float(jnp.max(jnp.abs(r - r0)))
        print(f"   max|diff vs 1d| {err:.3e}")

    r0i = timeit("cumsum 1d i32", jax.jit(jnp.cumsum), xi)
    for name, fn in (
        ("cumsum rows i32", cumsum_rows),
        ("cumsum cols i32", cumsum_cols),
        ("cumsum mm i32(3x7b)", cumsum_mm_i32),
    ):
        r = timeit(name, jax.jit(fn), xi)
        print(f"   exact: {bool(jnp.all(r == r0i))}")

    m0 = timeit("cummax 1d i32", jax.jit(jax.lax.cummax), xs)
    m1 = timeit("cummax cols i32", jax.jit(cummax_cols), xs)
    print(f"   exact: {bool(jnp.all(m0 == m1))}")

    j0 = timeit("idx baseline(1d scans)", jax.jit(idx_baseline), w, shift)
    variants = {
        "idx delta(1d cumsum)": lambda ww, ss: idx_delta(ww, ss),
        "idx delta(cols)": lambda ww, ss: idx_delta(
            ww, ss, cumsum=cumsum_cols, icumsum=cumsum_cols
        ),
        "idx delta(mm)": lambda ww, ss: idx_delta(
            ww, ss, cumsum=cumsum_mm_f32, icumsum=cumsum_mm_i32
        ),
        "idx baseline(cols scans)": lambda ww, ss: idx_baseline(
            ww, ss, cumsum=cumsum_cols, cummax=cummax_cols
        ),
    }
    for name, fn in variants.items():
        j = timeit(name, jax.jit(fn), w, shift)
        print(f"   match baseline: {bool(jnp.all(j == j0))}")


if __name__ == "__main__":
    main()
