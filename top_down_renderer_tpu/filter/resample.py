"""Systematic (low-variance) resampling.

Parity port of the resample loop in ParticleFilter::update
(/root/reference/src/particle_filter.cpp:171-187): samples u_i=(i+shift)/n
with one shared random shift; particle j is selected for the first j with
cumsum(w) > u_i (clamped to the last particle).

Fixed-shape formulation: all N slots are computed; slots >= n_new are
marked dead.  Dead source slots carry weight 0, so the flat cumsum never
selects them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from top_down_renderer_tpu.core.grids import Particles


def systematic_resample(
    particles: Particles,
    weights: jnp.ndarray,
    n_new: jnp.ndarray,
    n_active_old: jnp.ndarray,
    key: jax.Array,
) -> Particles:
    """Returns the resampled particle set with n_new alive particles."""
    n = particles.n_max
    shift = jax.random.uniform(key)
    i = jnp.arange(n, dtype=jnp.float32)
    u = (i + shift) / jnp.maximum(n_new, 1).astype(jnp.float32)
    csum = jnp.cumsum(weights)
    j = jnp.searchsorted(csum, u, side="right")
    j = jnp.minimum(j, jnp.maximum(n_active_old - 1, 0))

    alive = jnp.arange(n) < n_new
    take = lambda a: jnp.take(a, j, axis=0)
    w_new = jnp.where(alive, 1.0 / jnp.maximum(n_new, 1), 0.0)
    return Particles(
        init_px=take(particles.init_px),
        d_m=take(particles.d_m),
        theta=take(particles.theta),
        scale=take(particles.scale),
        have_init=take(particles.have_init),
        weight=w_new.astype(jnp.float32),
        last_dist=take(particles.last_dist),
        alive=alive,
    )
