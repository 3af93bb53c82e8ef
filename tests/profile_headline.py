"""Dev probe: per-stage timing of the headline conv step on the TPU.

Breaks the 102,400-particle tracked conv step (bench.py's operating
point) into its pipeline stages so the perf backlog (CLAUDE.md) can be
attacked with measurements instead of guesses:

  build   - build_conv_kernel (windowed circulant one-hot matmul)
  fold    - fold_kernel_s2d (16-phase relayout)
  field   - cost_field_s2d (the MXU conv)
  score   - the full jitted scoring stage (build+fold+field+gathers)
  tail    - make_tail_fn (weights post-process, resample, gmm, smask)
  step    - scoring + tail (the headline number's unit)

Run: python tests/profile_headline.py  (TPU; ~2 min warm)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def timeit(fn, *args, reps=30, warm=2):
    import jax

    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from top_down_renderer_tpu.config import FilterParams
    from top_down_renderer_tpu.filter import conv_score as cs
    from top_down_renderer_tpu.filter import pallas_score as ps
    from top_down_renderer_tpu.filter.filter import (
        _pad_class_weights,
        make_tail_fn,
        make_update_step_fast,
    )

    n = int(os.environ.get("BENCH_N", 102400))
    hw = int(os.environ.get("BENCH_MAP", 1024))
    c = 6
    theta_bins, range_bins = 100, 25
    scale, res_v = 2.0, 0.5
    extent, ww, s0 = 100, 16, 8
    region = cs.pick_region(extent + 16)
    mo = ps.pick_crop_size(scale * res_v, range_bins)
    print(f"n={n} map={hw} mo={mo} region={region} ww={ww}")

    (state, packed, map_size, stencil, scan, res, _p) = (
        ge._synthetic_setup(
            n, h=hw, w=hw, c=c, theta_bins=theta_bins,
            range_bins=range_bins, cluster=(hw // 2, hw // 2, extent),
            theta_spread=(0.7, 0.15),
        )
    )
    state = state.replace(
        particles=state.particles.replace(
            scale=jnp.full((n,), scale, jnp.float32)
        )
    )
    params = FilterParams(
        fixed_scale=scale, class_weights=[1.0] * c, force_on_map=True
    )
    cw = _pad_class_weights(params, c)
    maps = ps.build_padded_maps(packed)
    res_j = jnp.asarray(res_v, jnp.float32)
    s0_j = jnp.asarray(s0, jnp.int32)
    f = scale * res_v

    # --- stage: kernel build ---
    build = jax.jit(
        lambda sc: cs.build_conv_kernel(
            sc, cw, stencil, f, mo, "tracked", 40, ww, s0_j
        )
    )
    t_build = timeit(build, scan)
    kernel = build(scan)

    # --- stage: fold ---
    fold = jax.jit(cs.fold_kernel_s2d)
    t_fold = timeit(fold, kernel)

    # --- stage: conv field ---
    origin = jnp.asarray([512, 512], jnp.int32)
    s_out = 2 * ww + 1

    def field(m4, k):
        return cs.cost_field_s2d(m4, k, origin, mo, region, s_out)

    t_field = timeit(field, maps.padded4d, kernel)

    # --- full scoring stage + tail via make_update_step_fast ---
    tail_fn = make_tail_fn(params, n, 8, 10, theta_bins)
    update = make_update_step_fast(
        params, c, 1.0, theta_bins, n, "tracked", mo=mo,
        gmm_every=10, tail_fn=tail_fn, path="conv", region=region,
        window_w=ww,
    )

    def step(st):
        return update(st, maps, map_size, stencil, scan, res_j,
                      f_host=f, s0=s0)

    t_step = timeit(step, state, reps=30)

    # scoring stage alone: rebuild the inner score jit
    from top_down_renderer_tpu.filter.conv_score import make_conv_scorer

    scorer = make_conv_scorer(mo, region, "tracked", 40, 1.0, ww)
    p = state.particles

    score_jit = jax.jit(
        lambda sc: scorer(
            maps.padded3d, maps.padded4d, maps.pad, stencil, sc, cw,
            p.pose_px(), p.theta, jnp.asarray(f, jnp.float32), p.alive,
            s0_j,
        )
    )
    t_score = timeit(score_jit, scan)

    # tail alone
    cost, _norm, _kf = score_jit(scan)
    costj = cost / _norm

    def tail(st):
        return tail_fn(st, costj, p.theta, map_size)

    t_tail = timeit(tail, state, reps=30)

    # --- tail sub-stages ---
    from top_down_renderer_tpu.filter.filter import (
        postprocess_weights,
        pose_bbox,
        update_tail,
    )
    from top_down_renderer_tpu.filter import gmm as gmm_mod
    from top_down_renderer_tpu.filter.resample import systematic_resample
    from top_down_renderer_tpu.filter.scoring import (
        rotation_shift,
        shift_mask,
    )

    w_raw = jax.jit(
        lambda cj: 1.0 / (cj + 0.02)
    )(costj)

    post = jax.jit(
        lambda w: postprocess_weights(
            w, p.last_dist, p.alive, state.n_active
        )
    )
    t_post = timeit(post, w_raw)
    w_n = post(w_raw)

    key = jax.random.PRNGKey(7)
    rs = jax.jit(
        lambda w, k: systematic_resample(p, w, state.n_active,
                                         state.n_active, k)
    )
    t_rs = timeit(rs, w_n, key)

    g = jax.jit(
        lambda k: gmm_mod.compute_gmm(p, state.n_active, state.gmm.k, k)
    )
    t_gmm = timeit(g, key)

    sm = jax.jit(
        lambda th_: shift_mask(
            rotation_shift(th_, theta_bins), p.alive, theta_bins
        )
    )
    t_sm = timeit(sm, p.theta)
    bb = jax.jit(lambda _: pose_bbox(p))
    t_bb = timeit(bb, 0)
    ml = jax.jit(lambda w: p.ml_state()[jnp.argmax(w)])
    t_ml = timeit(ml, w_n)

    # --- field as explicit im2col matmul (conv-efficiency probe) ---
    dr, dc = cs.conv_dims(mo)
    f4 = cs.F_S2D
    dye, dxe = cs.s2d_extent(dr), cs.s2d_extent(dc)
    nyb = region // f4 + 1

    @jax.jit
    def field_mm(m4, k4):
        block = jax.lax.dynamic_slice(
            m4, (100, 100, 0),
            (nyb + dye - 1, nyb + dxe - 1, 128),
        )
        pat = jnp.stack(
            [
                jax.lax.dynamic_slice(
                    block, (dy, dx, 0), (nyb, nyb, 128)
                )
                for dy in range(dye)
                for dx in range(dxe)
            ],
            axis=2,
        ).reshape(nyb * nyb, dye * dxe * 128)
        kf = k4.reshape(dye * dxe * 128, -1)
        return jnp.dot(pat, kf, preferred_element_type=jnp.float32)

    k4 = jax.jit(cs.fold_kernel_s2d)(kernel)
    t_field_mm = timeit(field_mm, maps.padded4d, k4)

    print(f"build    {t_build:7.3f} ms")
    print(f"fold     {t_fold:7.3f} ms")
    print(f"field    {t_field:7.3f} ms")
    print(f"fieldMM  {t_field_mm:7.3f} ms  (im2col matmul probe)")
    print(f"score    {t_score:7.3f} ms  (build+fold+field+reads)")
    print(f"tail     {t_tail:7.3f} ms")
    print(f"  post   {t_post:7.3f} ms")
    print(f"  resamp {t_rs:7.3f} ms")
    print(f"  gmm    {t_gmm:7.3f} ms (amortized /{10}: {t_gmm/10:.3f})")
    print(f"  smask  {t_sm:7.3f} ms")
    print(f"  bbox   {t_bb:7.3f} ms")
    print(f"  mlst   {t_ml:7.3f} ms")
    print(f"step     {t_step:7.3f} ms  -> {1000.0 / t_step:.1f} steps/s")


if __name__ == "__main__":
    main()
