"""Decompose update_tail on the real TPU (fenced timing).

The crop-step decomposition measured tail ~11 ms standalone - but that
state had step=0 so compute_gmm ran every rep (gmm_every=10 amortizes
it 10x in production). This splits the tail into its pieces and times
update_tail at both a gmm and a non-gmm step.

Run: python tests/profile_tail.py
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

import __graft_entry__ as ge
from top_down_renderer_tpu.config import FilterParams
from top_down_renderer_tpu.filter import gmm as gmm_mod
from top_down_renderer_tpu.filter import stats as stats_mod
from top_down_renderer_tpu.filter.filter import (
    make_tail_fn,
    postprocess_weights,
    pose_bbox,
    shift_mask,
)
from top_down_renderer_tpu.filter.resample import systematic_resample
from top_down_renderer_tpu.filter.scoring import rotation_shift

N = int(os.environ.get("BENCH_N", 102400))
HW = int(os.environ.get("BENCH_MAP", 1024))
C = 6
TH, R = 100, 25


def timeit(name, f, *args, reps=10):
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1000:9.2f} ms")
    return dt


def main():
    (state, packed, map_size, stencil, scan, res, _p) = (
        ge._synthetic_setup(N, h=HW, w=HW, c=C, theta_bins=TH,
                            range_bins=R)
    )
    params = FilterParams(
        fixed_scale=2.0, class_weights=[1.0] * C, force_on_map=True
    )
    p = state.particles
    n_act = state.n_active
    cost = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (N,)))
    w = 1.0 / (cost + 0.01)
    key = jax.random.PRNGKey(1)

    timeit(
        "postprocess_weights",
        jax.jit(lambda w: postprocess_weights(w, p.last_dist, p.alive,
                                              n_act)),
        w,
    )
    timeit(
        "ml_state(argmax+gather)",
        jax.jit(lambda w: p.ml_state()[jnp.argmax(w)]),
        w,
    )
    timeit(
        "resample",
        jax.jit(
            lambda w, k: systematic_resample(p, w, n_act, n_act, k)
        ),
        w,
        key,
    )
    timeit(
        "compute_gmm",
        jax.jit(
            lambda k: gmm_mod.compute_gmm(p, n_act, state.gmm.k, k,
                                          k_max=8)
        ),
        key,
    )
    timeit(
        "adaptive_count",
        jax.jit(
            lambda: gmm_mod.adaptive_particle_count(state.gmm, n_act, N)
        ),
    )
    timeit(
        "smask+bbox",
        jax.jit(
            lambda: (
                shift_mask(rotation_shift(p.theta, TH), p.alive, TH),
                pose_bbox(p),
            )
        ),
    )
    timeit(
        "pose_stats",
        jax.jit(lambda: stats_mod.pose_stats(p, n_act)),
    )

    tail = make_tail_fn(params, N, 8, 10, TH)
    st_gmm = state.replace(step=jnp.asarray(0, jnp.int32))
    st_nogmm = state.replace(step=jnp.asarray(1, jnp.int32))
    timeit("tail(gmm step)", lambda: tail(st_gmm, cost, p.theta,
                                          map_size))
    timeit("tail(non-gmm step)", lambda: tail(st_nogmm, cost, p.theta,
                                              map_size))


if __name__ == "__main__":
    main()
