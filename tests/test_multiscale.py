"""Interpret-mode parity tests for the unknown-scale multi-bucket scorer.

The multi-scale path (filter/multiscale.py) must reproduce, per bucket,
exactly what the uniform-f crop scorer (filter/pallas_score.py) computes
at that bucket's effective f on that bucket's mip level - the kernel,
M build, and crop semantics are shared; only the variant key and the
pyramid origin computation are new.  The uniform scorer is itself
parity-tested against the exact gather (test_pallas_interpret.py), so
bucket-equality here closes the chain back to the reference
(/root/reference/src/state_particle.cpp:112-219 at the init regime's
log-uniform scales, particle_filter.cpp:19-84)."""

import numpy as np
import jax.numpy as jnp
import pytest

from top_down_renderer_tpu.filter import multiscale as ms
from top_down_renderer_tpu.filter import pallas_score as ps
from top_down_renderer_tpu.filter.scoring import rotation_shift
from top_down_renderer_tpu.maps.polar import polar_stencil

H = W = 256
C = 3
TH, R = 100, 25
MO = 12  # f_eff = 0.5 everywhere -> small crops keep interpret fast


def test_cluster_scales_init_population():
    """The reference's 10 discrete hypotheses cluster losslessly."""
    hyp = 10.0 ** (np.arange(10) / 10.0)
    scales = np.repeat(hyp, 100).astype(np.float32)
    slots = ms.cluster_scales(scales)
    assert slots is not None and len(slots) == 10
    np.testing.assert_allclose(np.sort(slots), hyp, rtol=1e-5)


def test_cluster_scales_diffused_population():
    """2%-diffused hypotheses still cluster within tolerance."""
    rng = np.random.default_rng(0)
    hyp = 10.0 ** (np.arange(8) / 10.0)
    scales = (
        np.repeat(hyp, 200)
        * (1.0 + rng.standard_normal(1600) * 0.005)
    ).astype(np.float32)
    slots = ms.cluster_scales(scales, rtol=0.03)
    assert slots is not None and len(slots) <= 12
    # every particle within 3% of its nearest slot
    d = np.abs(np.log(scales)[:, None] - np.log(slots)[None, :])
    assert np.max(d.min(axis=1)) < np.log1p(0.03)


def test_cluster_scales_continuum_rejects():
    rng = np.random.default_rng(1)
    scales = 10.0 ** rng.uniform(0, 1, 5000).astype(np.float32)
    assert ms.cluster_scales(scales) is None


def test_multi_mo_spread_gate(monkeypatch):
    """Adaptive mo: coarse while the posterior spans hypotheses, fine
    once it collapses to one diffused blob; env forces a fixed value."""
    monkeypatch.delenv("TDR_MULTI_MO", raising=False)
    assert ms.multi_mo() == ms.MO_MULTI
    assert ms.multi_mo(7.94) == ms.MO_MULTI
    assert ms.multi_mo(1.15) == ms.MO_MULTI_FINE
    assert ms.multi_mo(ms.MULTI_FINE_SPREAD) == ms.MO_MULTI_FINE
    monkeypatch.setenv("TDR_MULTI_MO", "24")
    assert ms.multi_mo(100.0) == 24
    monkeypatch.setenv("TDR_MULTI_MO", "12")
    assert ms.multi_mo(1.0) == 12


def test_multi_dispatch_rtol_ladder_and_fine_mo(monkeypatch):
    """A diffused single-blob population (the pre-freeze tracking
    phase) must stay on the multi path via the rtol ladder AND score at
    the fine mo - the r5 drive showed the base rtol overflowing
    MAX_BUCKETS there, silently falling ~300x to the exact gather."""
    from top_down_renderer_tpu.config import FilterParams, MapParams
    from top_down_renderer_tpu.filter.filter import ParticleFilter
    from top_down_renderer_tpu.maps.map import TopDownMap, build_grid
    import jax.numpy as jnp

    monkeypatch.delenv("TDR_MULTI_MO", raising=False)
    c = 3
    maps_bin = np.ones((c, 96, 96), np.float32)
    maps_bin[1, 44:52, :] = 0.0
    tdm = TopDownMap(MapParams(map_path="", num_classes=c, resolution=1.0))
    tdm.grid = build_grid(maps_bin, 1.0, 50.0)
    tdm.class_maps_binary = maps_bin
    tdm.have_map = True
    tdm.sample_pts_polar(100, 25)
    params = FilterParams(
        fixed_scale=-1.0, class_weights=[0.5] + [1.5] * (c - 1),
    )
    pf = ParticleFilter(
        512, tdm, params, seed=0, chunk_size=64, use_fast=True
    )
    pf._all_have_init = True
    rng = np.random.default_rng(5)
    n = pf.state.particles.scale.shape[0]

    # one diffused blob around 1.05, +-8%: needs > the base rtol but
    # fits a ladder rung; spread < MULTI_FINE_SPREAD -> fine mo
    blob = 1.05 * np.exp(rng.uniform(-0.08, 0.08, n))
    pf.state = pf.state.replace(
        particles=pf.state.particles.replace(
            scale=jnp.asarray(blob, jnp.float32)
        )
    )
    out = pf._fast_mode(1.0)
    assert out is not None and out[3] == "multi"
    assert out[1] == ms.MO_MULTI_FINE  # mo
    assert ms.cluster_scales(blob.astype(np.float32)) is None or True

    # a wide diffused continuum (log-range 0.7) overflows the base
    # rtol but clusters at a ladder rung; spread wide -> coarse mo
    wide = 2.0 * np.exp(rng.uniform(-0.35, 0.35, n))
    pf.state = pf.state.replace(
        particles=pf.state.particles.replace(
            scale=jnp.asarray(wide, jnp.float32)
        )
    )
    assert ms.cluster_scales(wide.astype(np.float32)) is None
    out = pf._fast_mode(1.0)
    assert out is not None and out[3] == "multi", (
        "ladder failed: fell to exact gather"
    )
    assert out[1] == ms.MO_MULTI


def test_multi_dispatch_tuple():
    """ParticleFilter._fast_mode must route the unknown-scale regime
    (10 discrete init hypotheses, particle_filter.cpp:19-25) to the
    multi-bucket path: init flavor pre-update, tracked after."""
    from top_down_renderer_tpu.config import FilterParams, MapParams
    from top_down_renderer_tpu.filter.filter import ParticleFilter
    from top_down_renderer_tpu.maps.map import TopDownMap, build_grid

    c = 3
    maps_bin = np.ones((c, 96, 96), np.float32)
    maps_bin[1, 44:52, :] = 0.0
    tdm = TopDownMap(MapParams(map_path="", num_classes=c, resolution=1.0))
    tdm.grid = build_grid(maps_bin, 1.0, 50.0)
    tdm.class_maps_binary = maps_bin
    tdm.have_map = True
    tdm.sample_pts_polar(100, 25)
    params = FilterParams(
        fixed_scale=-1.0, class_weights=[0.5] + [1.5] * (c - 1),
    )
    pf = ParticleFilter(
        640, tdm, params, seed=0, chunk_size=64, use_fast=True
    )
    fast = pf._fast_mode(1.0)
    assert fast is not None and fast[3] == "multi"
    mode, mo_m, _, _, slots, levels, bmi, kp = fast
    assert mode == "init"
    assert mo_m == ms.multi_mo()
    assert kp == 12 and len(slots) == 12 and len(bmi) == 12
    hyp = 10.0 ** (np.arange(10) / 10.0)
    np.testing.assert_allclose(np.sort(np.unique(slots[:10])), hyp,
                               rtol=1e-4)
    # f spans [1, 7.94]; smallest mip covers the smallest slot at
    # fmax = mo/(range_bins-1), largest is 8x coarser (3 octaves)
    fmax = ms.multi_mo() / 24.0
    assert levels[0] == ms.mip_for_f(1.0, fmax)
    assert levels[-1] == 8 * levels[0]
    pf._all_have_init = True
    assert pf._fast_mode(1.0)[0] == "tracked"
    # frozen scale must leave the multi path for the uniform dispatch
    pf.freeze_scale()
    fast2 = pf._fast_mode(1.0)
    assert fast2 is None or fast2[3] in ("conv", "crop")


def _world(seed=3):
    rng = np.random.default_rng(seed)
    packed = np.zeros((H, W, 8), np.float32)
    packed[..., :C] = rng.random((H, W, C)) * 50
    packed[..., C] = (rng.random((H, W)) < 0.9).astype(np.float32)
    stencil = polar_stencil(TH, R)
    scan = (rng.random((C, TH, R)) * 3).astype(np.float32)
    cw = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    return packed, stencil, scan, cw, rng


@pytest.fixture(scope="module")
def setup():
    packed, stencil, scan, cw, rng = _world()
    # two buckets: scale 0.5 at mip 1, scale 1.0 at mip 2; res = 1
    slot_vals = np.array([0.5, 1.0], np.float32)
    mips = (1, 2)
    pyr = ms.build_pyramid_maps(jnp.asarray(packed), mips)
    n = 96
    centers = rng.integers(48, 200, (n, 2)).astype(np.float32)
    scale = np.where(rng.random(n) < 0.5, 0.5, 1.0).astype(np.float32)
    return packed, stencil, scan, cw, pyr, slot_vals, centers, scale


def _uniform_ref_init(packed, stencil, scan, cw, centers, mip, f_eff):
    maps = ps.build_padded_maps(jnp.asarray(packed[::mip, ::mip]))
    return ps.score_init_fast_mo(
        maps, jnp.asarray(stencil), jnp.asarray(scan), cw,
        jnp.asarray(centers), f_eff, MO,
        map_resolution=float(mip), interpret=True,
    )


def test_multi_init_bucket_parity(setup, monkeypatch):
    packed, stencil, scan, cw, pyr, slot_vals, centers, scale = setup
    monkeypatch.setattr(ps, "init_p_tile", lambda mo, **kw: 16)
    score = ms.make_score_init_multi(
        2, (0, 1), interpret=True, mo=MO
    )
    costs, norms, kf = score(
        pyr, jnp.asarray(stencil), jnp.asarray(scan), cw,
        jnp.asarray(centers), jnp.asarray(scale),
        jnp.asarray(slot_vals), jnp.asarray(1.0, jnp.float32),
    )
    costs, norms, kf = map(np.asarray, (costs, norms, kf))
    for k, (mip, sv) in enumerate(zip((1, 2), slot_vals)):
        sel = scale == sv
        f_eff = sv * 1.0 / mip
        cr, nr, kr = _uniform_ref_init(
            packed, stencil, scan, cw, centers[sel], mip, f_eff
        )
        np.testing.assert_allclose(
            costs[sel], np.asarray(cr), rtol=2e-3, atol=1e-3,
            err_msg=f"bucket {k} costs",
        )
        np.testing.assert_allclose(
            norms[sel], np.asarray(nr), rtol=2e-3, atol=1e-3,
            err_msg=f"bucket {k} norms",
        )
        np.testing.assert_allclose(
            kf[sel], np.asarray(kr), atol=1e-3,
            err_msg=f"bucket {k} kf",
        )


def test_multi_init_sel_matches_host_epilogue(setup, monkeypatch):
    """sel=True multi init (in-kernel select_init_cost) must equal the
    sel=False rows through the host epilogue it replaces (exact: same
    kernel accumulator, same f32 ops)."""
    from top_down_renderer_tpu.filter.filter import select_init_cost

    packed, stencil, scan, cw, pyr, slot_vals, centers, scale = setup
    monkeypatch.setattr(ps, "init_p_tile", lambda mo, **kw: 16)
    args = (
        pyr, jnp.asarray(stencil), jnp.asarray(scan), cw,
        jnp.asarray(centers), jnp.asarray(scale),
        jnp.asarray(slot_vals), jnp.asarray(1.0, jnp.float32),
    )
    nums, dens, kf = ms.make_score_init_multi(
        2, (0, 1), interpret=True, mo=MO
    )(*args)
    costs = jnp.asarray(nums) / jnp.asarray(dens)
    costs = jnp.where(jnp.asarray(kf)[:, None] < 0.5, jnp.nan, costs)
    ref_cost, ref_theta = select_init_cost(costs, 40)

    got_cost, got_theta, got_kf = ms.make_score_init_multi(
        2, (0, 1), interpret=True, mo=MO, sel=True
    )(*args)
    np.testing.assert_array_equal(np.asarray(got_kf), np.asarray(kf))
    np.testing.assert_array_equal(
        np.asarray(got_cost), np.asarray(ref_cost)
    )
    np.testing.assert_allclose(
        np.asarray(got_theta), np.asarray(ref_theta), rtol=0, atol=1e-6
    )


def test_multi_tracked_bucket_parity(setup, monkeypatch):
    packed, stencil, scan, cw, pyr, slot_vals, centers, scale = setup
    monkeypatch.setattr(ps, "tracked_p_tile", lambda mo, **kw: 16)
    rng = np.random.default_rng(9)
    n = len(centers)
    thetas = (rng.random(n) * 2 * np.pi).astype(np.float32)
    score = ms.make_score_tracked_multi(
        2, (0, 1), interpret=True, mo=MO
    )
    cost, norm, kf = score(
        pyr, jnp.asarray(stencil), jnp.asarray(scan), cw,
        jnp.asarray(centers), jnp.asarray(thetas),
        jnp.asarray(scale), jnp.asarray(slot_vals),
        jnp.asarray(1.0, jnp.float32),
    )
    cost, norm, kf = map(np.asarray, (cost, norm, kf))
    for k, (mip, sv) in enumerate(zip((1, 2), slot_vals)):
        sel = scale == sv
        f_eff = sv * 1.0 / mip
        maps = ps.build_padded_maps(
            jnp.asarray(packed[::mip, ::mip])
        )
        cr, nr, kr = ps.score_tracked_fast_mo(
            maps, jnp.asarray(stencil), jnp.asarray(scan), cw,
            jnp.asarray(centers[sel]), jnp.asarray(thetas[sel]),
            f_eff, MO, map_resolution=float(mip), interpret=True,
        )
        np.testing.assert_allclose(
            cost[sel], np.asarray(cr), rtol=2e-3, atol=1e-3,
            err_msg=f"bucket {k} cost",
        )
        np.testing.assert_allclose(
            norm[sel], np.asarray(nr), rtol=2e-3, atol=1e-3,
            err_msg=f"bucket {k} norm",
        )
        np.testing.assert_allclose(
            kf[sel], np.asarray(kr), atol=1e-3,
            err_msg=f"bucket {k} kf",
        )


def test_pyramid_level_bounds(setup, monkeypatch):
    """A center whose mip-2 crop would cross the coarse level's top edge
    must be flagged out-of-range (kf 0) - never silently read the zero
    pad (or worse, a neighboring pyramid level's rows)."""
    packed, stencil, scan, cw, pyr, slot_vals, centers, scale = setup
    monkeypatch.setattr(ps, "init_p_tile", lambda mo, **kw: 16)
    # mip-2 level is 128 px + 2*64 pad; a center at y= -100 px maps to
    # cy2 = -50 -> y0l = -50 - 16 + 64 < 0 -> out of range
    bad = np.array([[64.0, -100.0], [64.0, 64.0]], np.float32)
    scl = np.array([1.0, 1.0], np.float32)  # both bucket 1 (mip 2)
    score = ms.make_score_init_multi(
        2, (0, 1), interpret=True, mo=MO
    )
    costs, norms, kf = score(
        pyr, jnp.asarray(stencil), jnp.asarray(scan), cw,
        jnp.asarray(bad), jnp.asarray(scl),
        jnp.asarray(slot_vals), jnp.asarray(1.0, jnp.float32),
    )
    kf = np.asarray(kf)
    assert kf[0] == 0.0
    assert kf[1] > 0.5


def test_multi_int4_bucket_parity(monkeypatch):
    """TDR_MAP_INT4=1 pyramid: the K-bucket multi scorers must match
    the uniform int4 scorers per bucket.  The per-channel maxima are
    planted at (0, 0) (kept by every [::mip] subsample) so the pyramid
    (quantize-then-subsample) and the uniform reference
    (subsample-then-quantize) see identical quantized values."""
    monkeypatch.setenv("TDR_MAP_INT4", "1")
    monkeypatch.setattr(ps, "init_p_tile", lambda mo, **kw: 16)
    monkeypatch.setattr(ps, "tracked_p_tile", lambda mo, **kw: 16)
    packed, stencil, scan, cw, rng = _world(seed=9)
    packed[0, 0, :C] = packed[..., :C].max() + 1.0
    packed[0, 0, C] = 1.0
    slot_vals = np.array([0.5, 1.0], np.float32)
    pyr = ms.build_pyramid_maps(jnp.asarray(packed), (1, 2))
    assert pyr.i4
    n = 96
    centers = rng.integers(48, 200, (n, 2)).astype(np.float32)
    scale = np.where(rng.random(n) < 0.5, 0.5, 1.0).astype(np.float32)

    score = ms.make_score_init_multi(2, (0, 1), interpret=True, mo=MO)
    costs, norms, kf = map(np.asarray, score(
        pyr, jnp.asarray(stencil), jnp.asarray(scan), cw,
        jnp.asarray(centers), jnp.asarray(scale),
        jnp.asarray(slot_vals), jnp.asarray(1.0, jnp.float32),
    ))
    for k, (mip, sv) in enumerate(zip((1, 2), slot_vals)):
        sel = scale == sv
        cr, nr, kr = _uniform_ref_init(
            packed, stencil, scan, cw, centers[sel], mip, sv / mip
        )
        np.testing.assert_allclose(
            costs[sel], np.asarray(cr), rtol=2e-3, atol=1e-3,
            err_msg=f"int4 bucket {k} costs",
        )
        np.testing.assert_allclose(
            kf[sel], np.asarray(kr), atol=1e-3,
            err_msg=f"int4 bucket {k} kf",
        )

    tscore = ms.make_score_tracked_multi(2, (0, 1), interpret=True,
                                         mo=MO)
    thetas = (rng.random(n) * 2 * np.pi).astype(np.float32)
    tc, tn, tk = map(np.asarray, tscore(
        pyr, jnp.asarray(stencil), jnp.asarray(scan), cw,
        jnp.asarray(centers), jnp.asarray(thetas), jnp.asarray(scale),
        jnp.asarray(slot_vals), jnp.asarray(1.0, jnp.float32),
    ))
    for k, (mip, sv) in enumerate(zip((1, 2), slot_vals)):
        sel = scale == sv
        maps_u = ps.build_padded_maps(
            jnp.asarray(packed[::mip, ::mip])
        )
        cu, nu, ku = ps.score_tracked_fast_mo(
            maps_u, jnp.asarray(stencil), jnp.asarray(scan), cw,
            jnp.asarray(centers[sel]), jnp.asarray(thetas[sel]),
            sv / mip, MO, map_resolution=float(mip), interpret=True,
        )
        np.testing.assert_allclose(
            tc[sel], np.asarray(cu), rtol=2e-3, atol=1e-3,
            err_msg=f"int4 tracked bucket {k} costs",
        )
        np.testing.assert_allclose(
            tk[sel], np.asarray(ku), atol=1e-3,
            err_msg=f"int4 tracked bucket {k} kf",
        )
