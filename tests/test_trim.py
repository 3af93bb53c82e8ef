"""Structural invariant behind pallas_score.trim_lanes.

The crop kernel contracts only the first trim_lanes(mo) int8 lanes of
each rolled crop (filter/pallas_score.py::_kernel); that is exact iff

  1. every M column past the trim is zero for ANY f that passes the
     pick_crop_size gate (stencil px <= (dc-16)//2 + mo), and
  2. the in-kernel rx lane-roll wraps its garbage into lanes at or
     beyond the trim (rx8 <= (RX-1)*8 -> wrap region starts at
     dc8 - 120 >= trim).

Checked here directly on the M builders at the largest legal f per
bucket; end-to-end numerics are pinned by the interpret-mode parity
suite (test_pallas_interpret.py, test_multiscale.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from top_down_renderer_tpu.filter import pallas_score as ps
from top_down_renderer_tpu.maps.polar import polar_stencil

TH, R = 100, 25


@pytest.mark.parametrize("mo", [12, 24])
def test_trimmed_build_matches_full_layout(mo):
    """The builders emit M directly at k = dr * trim_lanes(mo); that
    must equal the legacy full-crop-layout build with the structurally-
    zero lanes sliced off, and the dropped lanes must BE zero (so the
    kernel's trimmed contraction is exact for any gated f)."""
    rng = np.random.default_rng(0)
    stencil = jnp.asarray(polar_stencil(TH, R))
    scan = jnp.asarray(rng.random((3, TH, R)), jnp.float32) * 3
    cw = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    # largest f the bucket accepts (pick_crop_size gate)
    f = mo / (R - 1)
    assert ps.pick_crop_size(f, R) == mo
    dr, dc = ps.crop_dims(mo)
    t = ps.trim_lanes(mo)
    py, px = ps._stencil_pix(stencil, f, mo)
    cost_circ, norm_circ = ps.build_circulants(scan, cw)
    cost_circ = cost_circ.reshape(TH * R * 3, TH)
    for m, cc, nc in (
        (
            ps.build_m_tracked(scan, cw, stencil, f, mo)[0],
            cost_circ[:, : ps.GW],
            norm_circ[:, : ps.GW],
        ),
        (
            ps.build_m_init(scan, cw, stencil, f, mo, num_rot=40)[0],
            cost_circ[:, ps.search_shifts(TH, 40)],
            norm_circ[:, ps.search_shifts(TH, 40)],
        ),
    ):
        assert m.shape[-1] == dr * t, (m.shape, dr, t)
        s_m = m.shape[0]
        full = ps._build_base_t_from_pix(
            (py * dc + px) * ps.C_PAD, dr * dc * ps.C_PAD, 3,
            cc, nc, s_m,
        )
        f4 = np.asarray(full.astype(jnp.float32)).reshape(
            s_m, dr, dc * ps.C_PAD
        )
        # lanes past the trim are structurally zero in the full layout
        assert np.all(f4[..., t:] == 0.0), (mo, t)
        # support reaches near the trim edge (the trim is not vacuous)
        assert np.any(f4[..., t - 128 : t] != 0.0), (mo, t)
        np.testing.assert_array_equal(
            np.asarray(m.astype(jnp.float32)).reshape(s_m, dr, t),
            f4[..., :t],
        )


@pytest.mark.parametrize("mo", [12, 24])
def test_trim_clears_roll_wrap(mo):
    dr, dc = ps.crop_dims(mo)
    t = ps.trim_lanes(mo)
    assert t % 128 == 0
    # wrap garbage occupies lanes [dc8 - rx8, dc8); worst rx
    assert t <= dc * ps.C_PAD - (ps.RX - 1) * ps.C_PAD


def test_group_layout_counting_matches_argsort():
    """The counting-sort layout (n_groups<=256, n%512==0) must equal
    the argsort path bit for bit: same pos, same tile keys."""
    import numpy as np
    import jax.numpy as jnp
    from top_down_renderer_tpu.filter import pallas_score as ps

    rng = np.random.default_rng(3)
    # g > 256 exercises the two-pass LSD radix counting path (the
    # K-bucket multi layouts: K * N_GROUPS * RX = 1120 at K=10)
    for g, p_tile in ((112, 64), (16, 128), (3, 64), (256, 32),
                      (1120, 64), (257, 32), (300, 128)):
        n = 2048
        key = rng.integers(0, g, n).astype(np.int32)
        key[:50] = g - 1  # ensure an uneven group + empty groups
        kj = jnp.asarray(key)
        pos_c, tk_c, npad_c = ps._group_layout(kj, g, p_tile)
        # force the argsort fallback by breaking the n%block condition
        block = ps._COUNT_BLOCK
        try:
            ps._COUNT_BLOCK = n + 1
            pos_a, tk_a, npad_a = ps._group_layout(kj, g, p_tile)
        finally:
            ps._COUNT_BLOCK = block
        assert npad_c == npad_a
        np.testing.assert_array_equal(np.asarray(pos_c),
                                      np.asarray(pos_a))
        np.testing.assert_array_equal(np.asarray(tk_c),
                                      np.asarray(tk_a))
