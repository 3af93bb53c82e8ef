"""Weight post-processing parity vs a literal numpy port of the
reference's update loop (particle_filter.cpp:107-142), including the
NaN-repair, degenerate-reset, and distance-regularization semantics."""

import numpy as np
import jax.numpy as jnp

from top_down_renderer_tpu.filter.filter import postprocess_weights


def _np_reference(weights, last_dist, n):
    """Literal port (with the loop indices starting at 0; the reference's
    uninitialized `int i` is UB read as i=0)."""
    w = weights.copy()
    valid = ~np.isnan(w)
    total = w[valid].sum()
    num_valid = valid.sum()
    mean = total / num_valid if num_valid else 0.0
    under = valid & (w < mean)
    num_under = under.sum()
    bottom = (
        np.sqrt(((w[under] - mean) ** 2).sum() / num_under)
        if num_under
        else 0.0
    )
    if total == 0 or num_under < 1:
        w = np.ones_like(w)
    else:
        w = np.where(np.isnan(w), mean - bottom, w)
    w = w / w.sum()
    d = np.minimum(last_dist * 5.0, 1.0)
    w = d * w + (1.0 - d) / n
    return w / w.sum()


def test_postprocess_matches_reference():
    rng = np.random.default_rng(0)
    n = 1000
    w = rng.random(n).astype(np.float32) * 5
    w[::7] = np.nan
    w[::11] = 0.0
    ld = (rng.random(n) * 0.5).astype(np.float32)

    ours = np.asarray(
        postprocess_weights(
            jnp.asarray(w),
            jnp.asarray(ld),
            jnp.ones(n, bool),
            jnp.asarray(n),
        )
    )
    ref = _np_reference(w, ld, n)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-8)


def test_postprocess_all_nan_resets_uniform():
    n = 64
    w = np.full(n, np.nan, np.float32)
    ld = np.full(n, 1.0, np.float32)
    ours = np.asarray(
        postprocess_weights(
            jnp.asarray(w), jnp.asarray(ld),
            jnp.ones(n, bool), jnp.asarray(n),
        )
    )
    np.testing.assert_allclose(ours, np.full(n, 1.0 / n), rtol=1e-5)


def test_postprocess_zero_sum_resets_uniform():
    n = 64
    w = np.zeros(n, np.float32)
    ld = np.full(n, 1.0, np.float32)
    ours = np.asarray(
        postprocess_weights(
            jnp.asarray(w), jnp.asarray(ld),
            jnp.ones(n, bool), jnp.asarray(n),
        )
    )
    np.testing.assert_allclose(ours, np.full(n, 1.0 / n), rtol=1e-5)


def test_postprocess_dead_slots_zero():
    n = 64
    w = np.abs(np.random.default_rng(1).random(n)).astype(np.float32)
    alive = np.zeros(n, bool)
    alive[:40] = True
    w[40:] = 0.0
    ours = np.asarray(
        postprocess_weights(
            jnp.asarray(w),
            jnp.full(n, 1.0, np.float32),
            jnp.asarray(alive),
            jnp.asarray(40),
        )
    )
    assert np.all(ours[40:] == 0)
    np.testing.assert_allclose(ours.sum(), 1.0, rtol=1e-5)
