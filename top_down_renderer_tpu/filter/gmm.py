"""On-device GMM clustering of the particle cloud.

Capability port of ParticleFilter::computeGMM / gmmThread
(/root/reference/src/particle_filter.cpp:245-318).  The reference runs
OpenCV EM on a 1 Hz background thread over <=1000 strided particle samples
embedded as (x, y, 50cos(theta), 50sin(theta)), adapting the cluster count
by +-1 from mean-log-likelihood comparisons.  Here the whole thing is a
fixed-shape jitted EM (K_MAX components, masked to the active k) folded
into the filter step every `gmm_every` steps - no threads, no locks.

Statistical (not bitwise) parity: OpenCV's kmeans initialization is
replaced by strided-sample seeding; iteration count is fixed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from top_down_renderer_tpu.core.grids import GMMState, Particles

NUM_SAMPLES = 1000
EM_ITERS = 25
_REG = 1e-3


def _embed_samples(
    particles: Particles, n_active: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Strided subsample + 4D embedding (particle_filter.cpp:262-271)."""
    ml = particles.ml_state()
    n = jnp.maximum(n_active, 1)
    num = jnp.minimum(NUM_SAMPLES, n)
    i = jnp.arange(NUM_SAMPLES)
    idx = jnp.minimum(n - 1, i * n // jnp.maximum(num, 1))
    s = ml[idx]  # (S, 4): x, y, theta, scale
    x = jnp.stack(
        [
            s[:, 0],
            s[:, 1],
            50.0 * jnp.cos(s[:, 2]),
            50.0 * jnp.sin(s[:, 2]),
        ],
        axis=-1,
    )
    valid = (i < num).astype(jnp.float32)
    return x, valid


def _em_fit(
    x: jnp.ndarray,
    sample_w: jnp.ndarray,
    k: jnp.ndarray,
    k_max: int,
    key: jax.Array,
):
    """Run EM with k active components (of k_max slots).

    Returns (means (K,4), covs (K,4,4), weights (K,), mean_ll scalar).
    """
    s, d = x.shape
    comp_mask = jnp.arange(k_max) < k  # (K,)

    # seed means from strided samples (replaces OpenCV kmeans init)
    n_valid = jnp.maximum(jnp.sum(sample_w).astype(jnp.int32), 1)
    seed_idx = (jnp.arange(k_max) * n_valid) // k_max
    means0 = x[seed_idx]
    gvar = jnp.maximum(
        jnp.sum(sample_w[:, None] * (x - jnp.mean(x, 0)) ** 2, 0)
        / jnp.maximum(jnp.sum(sample_w), 1.0),
        _REG,
    )
    covs0 = jnp.tile(jnp.diag(gvar), (k_max, 1, 1))
    pis0 = jnp.where(comp_mask, 1.0 / jnp.maximum(k, 1), 0.0)

    def log_gauss(means, covs):
        # (S, K) log N(x | mu_k, Sigma_k)
        diff = x[:, None, :] - means[None, :, :]  # (S, K, D)
        chol = jnp.linalg.cholesky(
            covs + _REG * jnp.eye(d)[None]
        )  # (K, D, D)
        sol = jax.vmap(
            lambda L, dd: jax.scipy.linalg.solve_triangular(
                L, dd.T, lower=True
            ),
            in_axes=(0, 1),
        )(chol, diff)  # (K, D, S)
        maha = jnp.sum(sol**2, axis=1).T  # (S, K)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
        )
        return -0.5 * (maha + logdet[None, :] + d * jnp.log(2 * jnp.pi))

    def step(carry, _):
        means, covs, pis = carry
        lg = log_gauss(means, covs)
        logpi = jnp.where(comp_mask, jnp.log(jnp.maximum(pis, 1e-30)),
                          -jnp.inf)
        joint = lg + logpi[None, :]
        ll = jax.scipy.special.logsumexp(joint, axis=1)  # (S,)
        resp = jnp.exp(joint - ll[:, None]) * sample_w[:, None]
        nk = jnp.sum(resp, axis=0)  # (K,)
        safe_nk = jnp.maximum(nk, 1e-10)
        new_means = (resp.T @ x) / safe_nk[:, None]
        diff = x[:, None, :] - new_means[None, :, :]
        new_covs = (
            jnp.einsum("sk,skd,ske->kde", resp, diff, diff)
            / safe_nk[:, None, None]
        ) + _REG * jnp.eye(d)[None]
        new_pis = nk / jnp.maximum(jnp.sum(nk), 1e-10)
        mean_ll = jnp.sum(ll * sample_w) / jnp.maximum(
            jnp.sum(sample_w), 1.0
        )
        return (new_means, new_covs, new_pis), mean_ll

    (means, covs, pis), lls = jax.lax.scan(
        step, (means0, covs0, pis0), None, length=EM_ITERS
    )
    return means, covs, pis, lls[-1]


@functools.partial(jax.jit, static_argnames=("k_max",))
def compute_gmm(
    particles: Particles,
    n_active: jnp.ndarray,
    prev_k: jnp.ndarray,
    key: jax.Array,
    k_max: int = 8,
) -> GMMState:
    """Full computeGMM parity (particle_filter.cpp:252-318) with the
    adaptive +-1 cluster-count search."""
    x, sample_w = _embed_samples(particles, n_active)
    k = jnp.minimum(n_active // 20 + 1, prev_k)
    k = jnp.clip(k, 1, k_max)

    # one traced EM, vmapped over the three candidate cluster counts
    # {k-1, k, k+1} (the reference refits after choosing; we reuse the
    # candidate fit - same statistics, 1/4 the compile)
    ks = jnp.stack(
        [jnp.maximum(k - 1, 1), k, jnp.minimum(k + 1, k_max)]
    )
    keys = jax.random.split(key, 3)
    means3, covs3, _, lls = jax.vmap(
        _em_fit, in_axes=(None, None, 0, None, 0)
    )(x, sample_w, ks, k_max, keys)
    ll_dn, ll_k, ll_up = lls[0], lls[1], lls[2]

    # try increasing (only if k*50 < n_active, :280-286)
    inc_ok = (k * 50 < n_active) & (k + 1 <= k_max) & (ll_k + 0.3 < ll_up)
    # try decreasing (:288-294); decrement wins over increment (applied last)
    dec_ok = (k > 1) & (ll_k - 0.3 < ll_dn)
    dir_ = jnp.where(dec_ok, -1, jnp.where(inc_ok, 1, 0))
    k_new = jnp.clip(k + dir_, 1, k_max)

    means = means3[dir_ + 1]
    covs = covs3[dir_ + 1]

    # convert to (x, y, atan2) means + 3x3 covs with [2,2]=1 (:304-315)
    out_means = jnp.stack(
        [
            means[:, 0],
            means[:, 1],
            jnp.arctan2(means[:, 3], means[:, 2]),
        ],
        axis=-1,
    )
    out_covs = jnp.zeros((k_max, 3, 3), dtype=jnp.float32)
    out_covs = out_covs.at[:, :2, :2].set(covs[:, :2, :2])
    out_covs = out_covs.at[:, 2, 2].set(1.0)
    return GMMState(means=out_means, covs=out_covs, k=k_new)


def adaptive_particle_count(
    gmm: GMMState, n_active: jnp.ndarray, n_max: int
) -> jnp.ndarray:
    """Adaptive particle count from the sum of GMM covariance-ellipse areas
    (particle_filter.cpp:151-158): sum_k sqrt(l1)*sqrt(l2) of each 2x2
    position block, clamped to [3/4 n + 10, n_max]."""
    c = gmm.covs[:, :2, :2]
    tr = c[:, 0, 0] + c[:, 1, 1]
    det = c[:, 0, 0] * c[:, 1, 1] - c[:, 0, 1] * c[:, 1, 0]
    disc = jnp.sqrt(jnp.maximum((tr / 2) ** 2 - det, 0.0))
    l1 = jnp.maximum(tr / 2 + disc, 0.0)
    l2 = jnp.maximum(tr / 2 - disc, 0.0)
    # clip before the int cast: a huge ellipse (diverged filter) must
    # saturate at n_max, not wrap int32 and fall to the lower clamp
    area = jnp.floor(
        jnp.minimum(jnp.sqrt(l1) * jnp.sqrt(l2), float(n_max))
    ).astype(jnp.int32)
    active = (jnp.arange(gmm.covs.shape[0]) < gmm.k).astype(jnp.int32)
    n_new = jnp.sum(area * active)
    lower = 3 * n_active // 4 + 10
    return jnp.minimum(jnp.maximum(n_new, lower), n_max)
