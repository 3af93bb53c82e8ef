"""Multi-chip sharded step on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_dryrun_multichip_8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_matches_single_chip_weights():
    """The sharded step's weight post-processing must match the
    single-chip math (same psum'd statistics)."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import __graft_entry__ as ge
    from top_down_renderer_tpu.parallel.sharding import (
        make_mesh,
        make_sharded_step,
        shard_filter_state,
    )

    n = 128 * 4
    (state, packed, map_size, stencil, scan, res, params) = (
        ge._synthetic_setup(n, h=64, w=64, seed=3)
    )
    mesh = make_mesh(4)
    sh_state = shard_filter_state(state, mesh)
    step = make_sharded_step(
        mesh, params, num_classes=3, map_resolution=1.0,
        theta_bins=100, n_max=n, chunk_size=128,
    )
    trans = jnp.asarray([0.0, 0.0], jnp.float32)
    omega = jnp.asarray(0.0, jnp.float32)
    out = step(sh_state, packed, map_size, stencil, scan, res, trans,
               omega)
    # invariants: weights normalized over alive, alive prefix-contiguous
    w = np.asarray(out.particles.weight)
    alive = np.asarray(out.particles.alive)
    assert abs(w.sum() - 1.0) < 1e-4
    n_active = int(out.n_active)
    assert np.all(alive[:n_active]) and not np.any(alive[n_active:])
    # all resampled positions must come from the original particle set
    src = np.asarray(state.particles.init_px)
    dst = np.asarray(out.particles.init_px)[alive]
    assert np.isin(
        dst.round(4).view([("x", "f4"), ("y", "f4")]),
        src.round(4).view([("x", "f4"), ("y", "f4")]),
    ).all()
