"""Small geometry helpers shared across the framework."""

import jax.numpy as jnp


def wrap_angle(theta):
    """Wrap angle(s) to (-pi, pi].

    Branch-free equivalent of the reference's while-loops
    (particle_filter.cpp:215-216).
    """
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def rot2d(theta):
    """2x2 rotation matrix (Eigen::Rotation2D equivalent)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, -s], [s, c]])
