"""EDT parity vs scipy (the oracle for cv::distanceTransform PRECISE)."""

import numpy as np
import pytest
from scipy.ndimage import distance_transform_edt

import jax.numpy as jnp

from top_down_renderer_tpu.maps.edt import compute_dists, edt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_edt_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    present = rng.random((64, 96)) < 0.05
    present[0, 0] = True  # ensure at least one seed
    ours = np.asarray(edt(jnp.asarray(present), trunc_px=50))
    ref = np.minimum(distance_transform_edt(~present), 50.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_edt_truncation():
    present = np.zeros((128, 128), bool)
    present[0, 0] = True
    ours = np.asarray(edt(jnp.asarray(present), trunc_px=20))
    ref = np.minimum(distance_transform_edt(~present), 20.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    assert ours.max() == 20.0


def test_edt_empty_column_rows():
    # sparse seeds confined to one corner: exercises inf handling
    present = np.zeros((40, 40), bool)
    present[3, 5] = True
    ours = np.asarray(edt(jnp.asarray(present), trunc_px=50))
    ref = np.minimum(distance_transform_edt(~present), 50.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_compute_dists_parity():
    """Full computeDists semantics: scale, truncation, unknown-mask zeroing
    (top_down_map.cpp:289-326)."""
    rng = np.random.default_rng(3)
    c, h, w = 3, 48, 64
    class_maps = np.ones((c, h, w), np.float32)
    for i in range(c):
        ys, xs = rng.integers(0, h, 5), rng.integers(0, w, 5)
        class_maps[i, ys, xs] = 0.0
    # make a region unknown: all classes absent is the default; carve a
    # known-empty region by marking class 0 present in a block
    dists, mask = compute_dists(jnp.asarray(class_maps), 1.0, 50.0)
    dists, mask = np.asarray(dists), np.asarray(mask)

    expected_mask = (class_maps.sum(0) >= c).astype(np.uint8)
    np.testing.assert_array_equal(mask, expected_mask)
    for i in range(c):
        ref = np.minimum(distance_transform_edt(class_maps[i] != 0), 50.0)
        ref[expected_mask == 1] = 0.0
        np.testing.assert_allclose(dists[i], ref, atol=1e-4)


def test_compute_dists_resolution():
    # class 1 covers everything -> no unknown cells, so class 0's distance
    # field is the pure truncated EDT scaled by resolution
    present_maps = np.ones((2, 32, 32), np.float32)
    present_maps[0, 16, 16] = 0.0
    present_maps[1, :, :] = 0.0
    dists, mask = compute_dists(jnp.asarray(present_maps), 2.0, 50.0)
    assert np.asarray(mask).sum() == 0
    ref = np.minimum(
        distance_transform_edt(present_maps[0] != 0) * 2.0, 50.0
    )
    np.testing.assert_allclose(np.asarray(dists[0]), ref, atol=1e-3)
