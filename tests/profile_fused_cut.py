"""Decompose the FUSED headline conv step by graph truncation.

Standalone per-piece probes mis-attribute cost on the axon backend
(each isolated dispatch carries ~1.3 ms launch/RPC floor and loses the
fused step's overlap).  This probe instead jits PREFIXES of the real
fused step - XLA dead-code-eliminates everything after the returned
value - so stage cost = difference of adjacent prefixes, measured with
the same fusion context as production.

Run: python tests/profile_fused_cut.py  (TPU; ~6 compiles first touch)
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
from top_down_renderer_tpu.filter import conv_score as cs
from top_down_renderer_tpu.filter import gmm as gmm_mod
from top_down_renderer_tpu.filter import pallas_score as ps
from top_down_renderer_tpu.filter import particles as particles_mod
from top_down_renderer_tpu.filter import stats as stats_mod
from top_down_renderer_tpu.filter.filter import (
    pose_bbox,
    postprocess_weights,
    shift_mask,
    weight_from_cost,
)
from top_down_renderer_tpu.filter.resample import systematic_resample
from top_down_renderer_tpu.filter.scoring import rotation_shift

N = int(os.environ.get("BENCH_N", 102400))
HW = 1024
C = 6
MO, REGION, WW, S0 = 24, 128, 16, 10


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf[(0,) * leaf.ndim])  # value-read fence (scalar only)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf[(0,) * leaf.ndim])
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:30s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    (state, packed, map_size, stencil, scan, res, _p) = ge._synthetic_setup(
        N, h=HW, w=HW, c=C, cluster=(HW // 2, HW // 2, 100),
        theta_spread=(0.7, 0.15))
    res = jnp.asarray(0.5, jnp.float32)
    params = FilterParams(fixed_scale=2.0, class_weights=[1.0] * C,
                          force_on_map=True)
    maps = ps.build_padded_maps(packed)
    cw = jnp.ones(C, jnp.float32)
    scorer = cs.make_conv_scorer(MO, REGION, "tracked", 40, 1.0, WW)
    motion = jnp.asarray([1.0, 0.0, 0.0, 1.0, 1.0], jnp.float32)
    s0 = jnp.asarray(S0, jnp.int32)
    n_max = N

    def prefix(upto):
        def fn(st):
            key, k_prop = jax.random.split(st.key)
            p0 = particles_mod.propagate(
                st.particles, k_prop, motion[:2], motion[2], params,
                st.scale_frozen, dist=motion[3], noise_gate=motion[4])
            if upto == "propagate":
                return p0.theta
            f = p0.scale[0] * res
            if upto in ("kbuild", "kfold", "field"):
                # score sub-cuts: mirror make_conv_scorer's s2d branch
                # (returning the intermediate forces materialization,
                # so deltas bound each piece's in-graph cost)
                kernel = cs.build_conv_kernel(
                    scan, cw, stencil, f, MO, "tracked", 40, WW, s0)
                if upto == "kbuild":
                    return kernel
                fold = (cs.fold_kernel_s2d_mm if cs.fold_mm()
                        else cs.fold_kernel_s2d)
                k4 = fold(kernel)
                if upto == "kfold":
                    return k4
                center_px = p0.pose_px()
                cy = jnp.round(center_px[:, 1]).astype(jnp.int32) + maps.pad
                cx = jnp.round(center_px[:, 0]).astype(jnp.int32) + maps.pad
                hp, wp, _ = maps.padded3d.shape
                dr, dc = cs.conv_dims(MO)
                big = jnp.int32(1 << 30)
                oy = jnp.clip(jnp.min(jnp.where(p0.alive, cy, big)),
                              dr // 2, hp - (REGION + dr - 1) + dr // 2)
                ox = jnp.clip(jnp.min(jnp.where(p0.alive, cx, big)),
                              dc // 2, wp - (REGION + dc - 1) + dc // 2)
                out4, roy, rox = cs.cost_field_s2d_k4(
                    maps.padded4d, k4, jnp.stack([oy, ox]), MO, REGION,
                    2 * WW + 1)
                return out4
            num, den, kf = scorer(
                maps.padded3d, maps.padded4d, maps.pad, stencil, scan,
                cw, p0.pose_px(), p0.theta, f, p0.alive, s0)
            cost = jnp.where(kf < 0.5, jnp.nan, num / den)
            if upto == "score":
                return cost
            p = p0.replace(theta=p0.theta,
                           have_init=jnp.ones_like(p0.have_init))
            w_raw = weight_from_cost(cost, p, params, map_size)
            w = postprocess_weights(w_raw, p.last_dist, p.alive,
                                    st.n_active)
            if upto == "weights":
                return w
            ml_state = p.ml_state()[jnp.argmax(w)]
            n_new = gmm_mod.adaptive_particle_count(
                st.gmm, st.n_active, n_max)
            key, k_rs, k_gmm = jax.random.split(key, 3)
            newp = systematic_resample(p, w, n_new, st.n_active, k_rs)
            if upto == "resample":
                return newp.theta
            new_gmm = jax.lax.cond(
                st.step % 10 == 0,
                lambda _: gmm_mod.compute_gmm(newp, n_new, st.gmm.k,
                                              k_gmm, k_max=8),
                lambda _: st.gmm, operand=None)
            smask = shift_mask(rotation_shift(newp.theta, 100),
                               newp.alive, 100)
            st2 = st.replace(particles=newp, n_active=n_new,
                             ml_state=ml_state, gmm=new_gmm, key=key,
                             step=st.step + 1, bbox=pose_bbox(newp),
                             smask=smask)
            return st2
        return jax.jit(fn)

    st_nogmm = state.replace(step=jnp.asarray(1, jnp.int32))
    last = 0.0
    for stage in ("propagate", "kbuild", "kfold", "field", "score",
                  "weights", "resample", "full"):
        dt = timeit(f"upto:{stage}", prefix(stage), st_nogmm)
        print(f"   delta {dt - last:8.3f} ms")
        last = dt
    # gmm step for the amortized piece
    st_gmm = state.replace(step=jnp.asarray(0, jnp.int32))
    timeit("full (gmm step)", prefix("full"), st_gmm)


if __name__ == "__main__":
    main()
