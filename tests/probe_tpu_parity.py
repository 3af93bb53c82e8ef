"""Dev probe: crop-kernel vs exact-gather parity ON REAL TPU.

The interpret-mode CI tests emulate the kernel's rotate with an f32
round-trip; the hardware path uses the free i32-bitcast lane rotate.
This probe checks the HARDWARE numbers against the exact gather across
all 16 x-residuals (a wrong bitcast pairing or rotate direction shows
up as O(1) cost errors on 15/16 of the particles).

Run: python tests/probe_tpu_parity.py  (TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax.numpy as jnp

    from top_down_renderer_tpu.filter import pallas_score as ps
    from top_down_renderer_tpu.filter.scoring import (
        rotation_shift,
        score_all_rotations,
        search_shifts,
    )
    from top_down_renderer_tpu.maps.polar import polar_stencil

    H = W = 256
    C = 3
    TH, R = 100, 25
    F = 1.0  # -> mo 24
    N = 256

    rng = np.random.default_rng(5)
    packed = np.zeros((H, W, 8), np.float32)
    packed[..., :C] = rng.random((H, W, C)) * 50
    packed[..., C] = (rng.random((H, W)) < 0.9).astype(np.float32)
    stencil = polar_stencil(TH, R)
    scan = (rng.random((C, TH, R)) * 3).astype(np.float32)
    cw = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    maps = ps.build_padded_maps(jnp.asarray(packed))

    # cover every x-residual variant of the active layout (16 for the
    # int8 stack, 32 for the nibble-packed TDR_MAP_INT4=1 stack)
    nrx = 32 if ps.map_int4() else 16
    xs, ys = np.meshgrid(np.arange(nrx), np.arange(8))
    grid = np.stack([80.0 + xs.ravel(), 80.0 + ys.ravel()], -1)
    rnd = rng.integers(40, 210, (max(N - len(grid), 0), 2))
    centers = np.concatenate([grid, rnd])[:N].astype(np.float32)
    thetas = (rng.random(N) * 2 * np.pi).astype(np.float32)

    costs_e, kf_e = score_all_rotations(
        jnp.asarray(packed), jnp.asarray(stencil), jnp.asarray(scan),
        cw, jnp.asarray(centers), jnp.full(N, 1.0, jnp.float32),
        jnp.asarray(F, jnp.float32), num_classes=C,
        map_resolution=1.0, chunk_size=N,
    )
    costs_e, kf_e = np.asarray(costs_e), np.asarray(kf_e)

    mo = ps.pick_crop_size(F, R)
    print("mo =", mo)

    def check(ref, got, kf, label):
        ok = (kf >= 0.5) & ~np.isnan(ref)
        rel = np.abs(ref[ok] - got[ok]) / np.maximum(
            np.abs(ref[ok]), 1e-9
        )
        print(
            f"{label}: median rel {np.median(rel):.2e}  "
            f"mean {np.mean(rel):.2e}  "
            f">10% frac {np.mean(rel > 0.1):.3f}"
        )
        assert np.median(rel) < 5e-3, label
        assert np.mean(rel > 0.1) < 0.02, label

    num, den, kf = ps.score_tracked_fast_mo(
        maps, jnp.asarray(stencil), jnp.asarray(scan), cw,
        jnp.asarray(centers), jnp.asarray(thetas), F, mo,
    )
    s = np.asarray(rotation_shift(jnp.asarray(thetas), TH))
    ref = costs_e[np.arange(N), s]
    got = np.asarray(num) / np.asarray(den)
    check(ref, got, kf_e, "tracked-hw")

    nums, dens, kfi = ps.score_init_fast_mo(
        maps, jnp.asarray(stencil), jnp.asarray(scan), cw,
        jnp.asarray(centers), F, mo,
    )
    ssh = np.asarray(search_shifts(TH, 40))
    refi = costs_e[:, ssh]
    goti = np.asarray(nums) / np.asarray(dens)
    kfb = np.broadcast_to(kf_e[:, None], refi.shape)
    check(refi.ravel(), goti.ravel(), kfb.ravel(), "init-hw")

    # sel_init: the in-kernel argmin must agree with the host epilogue
    # applied to the same kernel's sel=False rows (same f32 math)
    from top_down_renderer_tpu.filter.filter import select_init_cost

    costs_rows = jnp.asarray(nums) / jnp.asarray(dens)
    costs_rows = jnp.where(
        jnp.asarray(kfi)[:, None] < 0.5, jnp.nan, costs_rows
    )
    ref_cost, ref_theta = select_init_cost(costs_rows, 40)
    got_cost, got_theta, kfs = ps.score_init_sel_mo(
        maps, jnp.asarray(stencil), jnp.asarray(scan), cw,
        jnp.asarray(centers), F, mo,
    )
    np.testing.assert_allclose(
        np.asarray(kfs), np.asarray(kfi), atol=1e-5
    )
    theta_match = np.mean(
        np.asarray(got_theta) == np.asarray(ref_theta)
    )
    rc, gc = np.asarray(ref_cost), np.asarray(got_cost)
    rel = np.abs(rc - gc) / np.maximum(np.abs(rc), 1e-9)
    print(
        f"sel-init-hw: theta match {theta_match:.3f}  "
        f"cost median rel {np.median(rel):.2e}"
    )
    assert theta_match > 0.99, theta_match
    assert np.median(rel) < 1e-5
    print("TPU PARITY OK")


if __name__ == "__main__":
    main()
