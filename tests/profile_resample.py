"""Chained micro-decomposition of systematic_resample (real TPU).

Standalone dispatches carry a ~3 ms fence/RPC floor on axon, so each
piece here is timed as a CHAIN of reps dependent iterations inside one
jit (the output feeds the next iteration), fenced once - the same
regime the production step loop runs in.

Run: python tests/profile_resample.py
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
REPS = 20


def timeit_chain(name, step, x0):
    """step: (carry) -> carry with identical structure."""

    @jax.jit
    def run(x):
        def body(i, x):
            return step(x)

        return jax.lax.fori_loop(0, REPS, body, x)

    out = run(x0)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    out = run(x0)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    print(f"{name:28s} {(time.perf_counter() - t0) / REPS * 1e3:9.2f} ms")


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random(N), jnp.float32)
    packed = jnp.asarray(rng.random((N, 8)), jnp.float32)
    j_idx = jnp.asarray(np.sort(rng.integers(0, N, N)), jnp.int32)

    # pieces (perturb input from output to defeat CSE/hoisting)
    timeit_chain("cumsum", lambda x: jnp.cumsum(x) * 1e-6 + 1e-6, w)
    timeit_chain(
        "cummax",
        lambda x: jax.lax.cummax(x) * 0.999 + 1e-6,
        w,
    )
    timeit_chain(
        "scatter_max+cummax",
        lambda x: jax.lax.cummax(
            jnp.zeros(N, jnp.float32)
            .at[jnp.clip(x, 0, N - 1).astype(jnp.int32)]
            .max(x, mode="drop")
        )
        + 1.0,
        w * N,
    )
    timeit_chain(
        "row_gather(N,8)",
        lambda p: p[j_idx] + p[0, 0] * 1e-9,
        packed,
    )

    # the full resample, chained on the packed-fields carry
    from top_down_renderer_tpu.core.grids import Particles
    from top_down_renderer_tpu.filter.resample import systematic_resample

    p0 = Particles(
        init_px=jnp.asarray(rng.random((N, 2)), jnp.float32) * 100,
        d_m=jnp.zeros((N, 2), jnp.float32),
        theta=jnp.asarray(rng.random(N), jnp.float32),
        scale=jnp.ones(N, jnp.float32),
        have_init=jnp.ones(N, bool),
        weight=jnp.asarray(rng.random(N), jnp.float32),
        last_dist=jnp.zeros(N, jnp.float32),
        alive=jnp.ones(N, bool),
    )
    na = jnp.asarray(N, jnp.int32)

    def full(p):
        out = systematic_resample(
            p, p.weight + 1e-9, na, na, jax.random.PRNGKey(0)
        )
        return out.replace(
            weight=out.weight + out.theta * 1e-9  # data-dep carry
        )

    timeit_chain("resample_full", full, p0)

    def full_scatter(p):
        out = systematic_resample(
            p, p.weight + 1e-9, na, na, jax.random.PRNGKey(0),
            via_scatter=True,
        )
        return out.replace(weight=out.weight + out.theta * 1e-9)

    timeit_chain("resample_scatter", full_scatter, p0)


def blocked_probe():
    """Blocked 2-level scans vs XLA's 1D lowering."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.random(N), jnp.float32)

    def blocked_cumsum(x, nb=1024):
        xb = x.reshape(-1, nb)
        within = jnp.cumsum(xb, axis=1)
        tot = within[:, -1]
        off = jnp.cumsum(tot) - tot
        return (within + off[:, None]).reshape(-1)

    def blocked_cummax(x, nb=1024):
        xb = x.reshape(-1, nb)
        within = jax.lax.cummax(xb, axis=1)
        tot = within[:, -1]
        off = jax.lax.cummax(tot)
        off = jnp.concatenate(
            [jnp.full((1,), -jnp.inf, x.dtype), off[:-1]]
        )
        return jnp.maximum(within, off[:, None]).reshape(-1)

    timeit_chain("blocked_cumsum",
                 lambda x: blocked_cumsum(x) * 1e-6 + 1e-6, w)
    timeit_chain("blocked_cummax",
                 lambda x: blocked_cummax(x) * 0.999 + 1e-6, w)
    # parity
    np.testing.assert_allclose(
        np.asarray(blocked_cumsum(w)), np.asarray(jnp.cumsum(w)),
        rtol=1e-5, atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(blocked_cummax(w)),
        np.asarray(jax.lax.cummax(w)),
    )
    print("blocked parity OK")


if __name__ == "__main__":
    if os.environ.get("BLOCKED", "0") == "1":
        blocked_probe()
    else:
        main()
