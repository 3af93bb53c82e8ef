"""Experiments: kernel-build strategies + fold variants + tail parts."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tdr")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax, jax.numpy as jnp
import numpy as np
import __graft_entry__ as ge
from top_down_renderer_tpu.config import FilterParams
from top_down_renderer_tpu.filter import conv_score as cs
from top_down_renderer_tpu.filter.pallas_score import C_PAD, _stencil_pix
from top_down_renderer_tpu.filter.scoring import build_circulants
from top_down_renderer_tpu.filter import gmm as gmm_mod
from top_down_renderer_tpu.filter.resample import systematic_resample
from top_down_renderer_tpu.filter.filter import postprocess_weights

n = 102400
c = 6
mo, ww, s0v = 24, 16, 10
(state, packed, map_size, stencil, scan, res, _p) = ge._synthetic_setup(
    n, h=1024, w=1024, c=c, cluster=(512, 512, 100), theta_spread=(0.7, .15))
cw = jnp.ones(c, jnp.float32)
f = jnp.asarray(1.0, jnp.float32)
th, r = 100, 25


def timeit(name, fn, *args, reps=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/reps*1000:8.3f} ms",
          flush=True)
    return out


# --- scatter-based kernel build (HWIO, no transpose) ---
def build_kernel_scatter(scan_, s0_):
    dr, dc = cs.conv_dims(mo)
    cost_circ, norm_circ = build_circulants(scan_, cw)
    cost_circ = cost_circ.reshape(th * r * c, th)
    off = jnp.round(stencil.reshape(-1, 2) * f).astype(jnp.int32)
    pix8 = ((off[:, 0] + dr // 2) * dc + (off[:, 1] + dc // 2)) * C_PAD
    tr = pix8.shape[0]
    cols = (s0_ + jnp.arange(ww)) % th
    cost_cols = cost_circ[:, cols]
    norm_cols = norm_circ[:, cols]
    s_cols = 2 * ww + 1
    circ2 = jnp.zeros((tr, C_PAD, s_cols), jnp.float32)
    circ2 = circ2.at[:, :c, :ww].set(cost_cols.reshape(tr, c, ww))
    circ2 = circ2.at[:, c, ww:2 * ww].set(norm_cols)
    circ2 = circ2.at[:, c, 2 * ww].set(1.0)
    rowvals = (pix8[:, None] + jax.lax.broadcasted_iota(
        jnp.int32, (tr, C_PAD), 1)).reshape(-1)
    base = jnp.zeros((dr * dc * C_PAD, s_cols), jnp.float32)
    base = base.at[rowvals].add(circ2.reshape(tr * C_PAD, s_cols))
    return base.reshape(dr, dc, C_PAD, s_cols).astype(jnp.bfloat16)


stc = jnp.asarray(stencil)
stencil = stc
kb_sc = jax.jit(build_kernel_scatter)
k_hwio = timeit("build_kernel_scatter(HWIO)", kb_sc, scan,
                jnp.asarray(s0v, jnp.int32))

kb_oh = jax.jit(lambda sc_: cs.build_conv_kernel(
    sc_, cw, stencil, f, mo, "tracked", 40, ww, jnp.asarray(s0v)))
kernel = timeit("build_conv_kernel(one-hot)", kb_oh, scan)

# parity check
k_ref = np.asarray(kernel).transpose(1, 2, 3, 0)
np.testing.assert_allclose(np.asarray(k_hwio, np.float32), k_ref,
                           rtol=1e-2, atol=1e-3)
print("scatter == one-hot kernel: OK", flush=True)

# --- fold variants ---
fold_ohwi = jax.jit(cs.fold_kernel_s2d)
timeit("fold OHWI (current)", fold_ohwi, kernel)


def fold_hwio(khwio):
    """(dr, dc, 8, S) -> (DYe, DXe, 128, 16*S) HWIO."""
    dr, dc, c8, s = khwio.shape
    F = 4
    dye, dxe = cs.s2d_extent(dr), cs.s2d_extent(dc)
    kp = jnp.pad(khwio, ((3, F * dye - dr), (3, F * dxe - dc),
                         (0, 0), (0, 0)))
    phases = []
    for py in range(F):
        for px in range(F):
            ks = jax.lax.slice(
                kp, (3 - py, 3 - px, 0, 0),
                (3 - py + F * dye, 3 - px + F * dxe, c8, s))
            phases.append(
                ks.reshape(dye, F, dxe, F, c8, s)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(dye, dxe, F * F * c8, s))
    return jnp.concatenate(phases, axis=3)


fold_hw = jax.jit(fold_hwio)
timeit("fold HWIO", fold_hw, k_hwio)

# --- fused scatter-build + fold + conv + gather (score replacement) ---
origin = jnp.asarray([564, 564])


def score_fused(scan_, s0_):
    khwio = build_kernel_scatter(scan_, s0_)
    k4 = fold_hwio(khwio)
    F = 4
    dr, dc = cs.conv_dims(mo)
    dye, dxe = cs.s2d_extent(dr), cs.s2d_extent(dc)
    region = 128
    nyb = region // F + 1
    y0 = origin[0] - dr // 2
    x0 = origin[1] - dc // 2
    from top_down_renderer_tpu.filter.pallas_score import build_padded_maps
    block = jax.lax.dynamic_slice(
        maps4, (y0 // F, x0 // F, 0),
        (nyb + dye - 1, nyb + dxe - 1, 128))
    out = jax.lax.conv_general_dilated(
        block[None], k4, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return out


from top_down_renderer_tpu.filter.pallas_score import build_padded_maps
maps = build_padded_maps(packed)
maps4 = maps.padded4d
sf = jax.jit(score_fused)
timeit("scatter+foldHWIO+conv fused", sf, scan, jnp.asarray(s0v, jnp.int32))

# --- tail components ---
params = FilterParams(fixed_scale=2.0, class_weights=[1.0] * c,
                      force_on_map=True)
p = state.particles
w = p.weight
key = jax.random.PRNGKey(0)
pp = jax.jit(lambda w_, p_: postprocess_weights(
    w_, p_.last_dist, p_.alive, jnp.asarray(n)))
timeit("postprocess_weights", pp, w, p)
rs = jax.jit(lambda p_, w_, k_: systematic_resample(
    p_, w_, jnp.asarray(n), jnp.asarray(n), k_))
timeit("systematic_resample", rs, p, w, key)
g = jax.jit(lambda p_, k_: gmm_mod.compute_gmm(
    p_, jnp.asarray(n), jnp.asarray(1), k_))
timeit("compute_gmm", g, p, key)
from top_down_renderer_tpu.filter.filter import pose_bbox
from top_down_renderer_tpu.filter.scoring import rotation_shift
def smask_bbox(p_):
    shifts = rotation_shift(p_.theta, th)
    sm = (jnp.zeros(th, bool)
          .at[jnp.where(p_.alive, shifts, th)].max(True, mode="drop"))
    return sm, pose_bbox(p_)
timeit("smask+bbox", jax.jit(smask_bbox), p)
