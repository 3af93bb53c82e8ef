"""Headline benchmark: full particle-filter steps/sec at 100k particles
on one TPU chip (BASELINE.json north-star: >50 steps/s, >=100k particles
scored per scan).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on the default platform (the real TPU under axon); BENCH_* env vars
override particle count / steps / map size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from top_down_renderer_tpu.config import FilterParams
    from top_down_renderer_tpu.filter.filter import (
        make_update_step,
        make_update_step_fast,
    )
    from top_down_renderer_tpu.filter import pallas_score as ps
    from top_down_renderer_tpu.filter.particles import propagate
    import __graft_entry__ as ge

    n = int(os.environ.get("BENCH_N", 102400))
    steps = int(os.environ.get("BENCH_STEPS", 50))
    hw = int(os.environ.get("BENCH_MAP", 1024))
    chunk = int(os.environ.get("BENCH_CHUNK", 4096))
    # converged-regime operating point: fixed scale 2 px/m, range res
    # 0.5 m/bin (range_scale_min) -> f = 1.0, crop bucket d = 64
    scale = float(os.environ.get("BENCH_SCALE", 2.0))
    res_v = float(os.environ.get("BENCH_RES", 0.5))
    exact = os.environ.get("BENCH_EXACT", "0") == "1"
    c = 6
    theta_bins, range_bins = 100, 25

    # converged-tracking cloud: clustered in a ~100 px region (the
    # adaptive particle count + resampling concentrate the cloud after
    # convergence; this is the serving regime the target describes)
    extent = int(os.environ.get("BENCH_EXTENT", 100))
    # converged theta posterior: a narrow band around the heading
    theta_spread = float(os.environ.get("BENCH_THETA_SPREAD", 0.15))
    (state, packed, map_size, stencil, scan, res, _params) = (
        ge._synthetic_setup(
            n, h=hw, w=hw, c=c, theta_bins=theta_bins,
            range_bins=range_bins,
            cluster=(hw // 2, hw // 2, extent) if extent > 0 else None,
            theta_spread=(0.7, theta_spread)
            if theta_spread > 0 else None,
        )
    )
    state = state.replace(
        particles=state.particles.replace(
            scale=jnp.full((n,), scale, jnp.float32)
        )
    )
    res = jnp.asarray(res_v, jnp.float32)
    params = FilterParams(
        fixed_scale=scale, class_weights=[1.0] * c, force_on_map=True
    )

    multi = os.environ.get("BENCH_MULTI", "0") == "1"
    s0 = 0
    if multi:
        # unknown-scale regime: the reference's 10 discrete scale
        # hypotheses (particle_filter.cpp:19-25) through the K-bucket
        # multi-scale crop path (filter/multiscale.py)
        from top_down_renderer_tpu.filter import multiscale as msc
        from top_down_renderer_tpu.filter.filter import (
            make_update_step_multiscale,
        )

        mode = os.environ.get("BENCH_MODE", "tracked")
        hyp = (10.0 ** (np.arange(10) / 10.0)).astype(np.float32)
        state = state.replace(
            particles=state.particles.replace(
                scale=jnp.asarray(hyp[np.arange(n) % 10]),
                have_init=jnp.full(
                    (n,), mode == "tracked", dtype=bool
                ),
            ),
            scale_frozen=jnp.asarray(False),
        )
        params = FilterParams(
            fixed_scale=-1.0, class_weights=[1.0] * c,
            force_on_map=True,
        )
        mips = tuple(msc.mip_for_f(float(s) * res_v) for s in hyp)
        levels = tuple(sorted(set(mips)))
        bmi = tuple(levels.index(m) for m in mips)
        update_multi = make_update_step_multiscale(
            params, grid_num_classes=c, map_resolution=1.0,
            theta_bins=theta_bins, n_max=n, mode=mode,
            n_buckets=10, bucket_mip_idx=bmi, gmm_every=10,
        )
        pyr = msc.build_pyramid_maps(packed, levels)
        slots_j = jnp.asarray(hyp)

        def update(st, _map_arg, msz, sten, sc, r, **_kw):
            return update_multi(st, pyr, msz, sten, sc, r, slots_j)

        map_arg = None
        path = f"multi-{mode}-k10-mips{levels}"
        ww = None
    elif exact:
        update = make_update_step(
            params, grid_num_classes=c, map_resolution=1.0,
            theta_bins=theta_bins, n_max=n, gmm_every=10,
            chunk_size=chunk,
        )
        map_arg = packed
        path = "exact"
    else:
        from top_down_renderer_tpu.filter import conv_score as cs

        mode = os.environ.get("BENCH_MODE", "tracked")
        mip = 1
        mo = ps.pick_crop_size(scale * res_v, range_bins)
        if mo is None:
            # exploration regime: mip-crop fallback (filter.py dispatch)
            for mip in (2, 4, 8, 16, 32):
                mo = ps.pick_crop_size(scale * res_v / mip, range_bins)
                if mo is not None:
                    break
        region = (
            cs.pick_region(extent + 16)
            if extent > 0 and mip == 1
            else None
        )
        path = "conv" if region else "crop"
        # shift window: covers the theta band + noise/turn margin (the
        # runtime dispatch derives this from FilterState.smask)
        if theta_spread > 0 and path == "conv" and mode == "tracked":
            span = int(np.ceil(theta_spread * theta_bins / np.pi)) + 1
            need = span + 1 + 2 * 4
            ww = next(
                (w_ for w_ in (16, 32, 64) if need <= w_), theta_bins
            )
            s0 = int(
                round((0.7 - theta_spread) * theta_bins / (2 * np.pi))
                - 4
            ) % theta_bins
        else:
            ww, s0 = theta_bins, 0
        update = make_update_step_fast(
            params, grid_num_classes=c, map_resolution=1.0,
            theta_bins=theta_bins, n_max=n, mode=mode, mo=mo,
            gmm_every=10, path=path, region=region or 0, window_w=ww,
            mip=mip,
        )
        map_arg = ps.build_padded_maps(
            packed[::mip, ::mip] if mip > 1 else packed
        )
        if mip > 1:
            path = f"crop-mip{mip}"

    prop = jax.jit(
        lambda st, sub: propagate(
            st.particles,
            sub,
            jnp.asarray([1.0, 0.0], jnp.float32),
            jnp.asarray(0.01, jnp.float32),
            params,
            st.scale_frozen,
        )
    )
    # the fused conv step folds propagate into the same dispatch (and
    # the crop step too under TDR_FUSE_CROP=1, filter.crop_fused)
    from top_down_renderer_tpu.filter.filter import crop_fused

    fused_motion = (not exact) and (not multi) and (
        path == "conv" or (path.startswith("crop") and crop_fused())
    )
    motion_j = jnp.asarray([1.0, 0.0, 0.01, 1.0, 1.0], jnp.float32)

    def full_step(state, scan):
        if fused_motion:
            return update(
                state, map_arg, map_size, stencil, scan, res,
                f_host=scale * res_v, s0=s0, motion=motion_j,
            )
        key, sub = jax.random.split(state.key)
        parts = prop(state, sub)
        st = state.replace(particles=parts, key=key)
        if exact:
            return update(st, map_arg, map_size, stencil, scan, res)
        return update(
            st, map_arg, map_size, stencil, scan, res,
            f_host=scale * res_v, s0=s0,
        )

    # warmup / compile
    st = full_step(state, scan)
    st = full_step(st, scan)
    # a device->host VALUE read fences the (serial) device queue:
    # jax.block_until_ready can return early on the axon backend
    float(np.asarray(st.particles.weight[0]))

    t0 = time.perf_counter()
    for _ in range(steps):
        st = full_step(st, scan)
    float(np.asarray(st.particles.weight[0]))
    dt = time.perf_counter() - t0

    steps_per_s = steps / dt
    particles_per_s = steps_per_s * n
    # baseline target: >50 PF steps/s at 100k particles on 1 chip
    print(
        json.dumps(
            {
                "metric": f"pf_steps_per_s_at_{n}_particles",
                "value": round(steps_per_s, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / 50.0, 3),
                "extra": {
                    "particles_scored_per_s": int(particles_per_s),
                    "step_ms": round(1000 * dt / steps, 2),
                    "map": f"{hw}x{hw}x{c}", "path": path, "extent": extent, "window": ww if not exact else None,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
