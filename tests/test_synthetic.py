"""Synthetic homography dataset: shapes, determinism, GT consistency."""

import numpy as np

from cotr_tpu.data.synthetic import SyntheticHomographyDataset
from cotr_tpu.utils.constants import MAX_SIZE


def test_sample_shapes_and_ranges():
    ds = SyntheticHomographyDataset(length=4, num_kp=25, seed=0)
    s = ds[1]
    assert s["image"].shape == (MAX_SIZE, 2 * MAX_SIZE, 3)
    assert s["image"].dtype == np.uint8  # raw by default (device normalize)
    assert s["queries"].shape == (50, 2)  # bidirectional
    assert (s["queries"] >= 0).all() and (s["queries"] <= 1).all()
    assert (s["queries"][:25, 0] <= 0.5).all()
    assert (s["queries"][25:, 0] >= 0.5).all()


def test_deterministic_per_index():
    ds = SyntheticHomographyDataset(length=4, num_kp=10, seed=5)
    a, b = ds[2], ds[2]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["queries"], b["queries"])


def test_correspondences_match_warp():
    """The target points must land on the same CONTENT: sample both canvas
    halves at corresponding points and compare (bilinear, tolerant —
    resampling blurs)."""
    from scipy.ndimage import map_coordinates

    ds = SyntheticHomographyDataset(length=4, num_kp=50, seed=2,
                                    max_corner_jitter=0.1, raw_uint8=False)
    s = ds[0]
    img = s["image"]
    corrs = s["corrs"] * np.array([512, 256, 512, 256])
    a_gray = img[:, :256].mean(-1)
    b_gray = img[:, 256:].mean(-1)
    va = map_coordinates(a_gray, [corrs[:, 1], corrs[:, 0]], order=1)
    vb = map_coordinates(b_gray, [corrs[:, 3], corrs[:, 2] - 256], order=1)
    # most correspondences should agree in intensity
    agree = np.abs(va - vb) < 0.35
    assert agree.mean() > 0.8, agree.mean()
