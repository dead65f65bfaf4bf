"""CV solvers: affine/homography exactness, RANSAC-F robustness,
triangulation, and the Delaunay densifier."""

import numpy as np
import pytest

from cotr_tpu.ops.geometry_cv import (affine_from_3pts, apply_homography,
                                      eight_point, find_fundamental_ransac,
                                      homography_from_4pts, pixel_rays,
                                      triangulate_rays_midpoint,
                                      warp_perspective)


def test_affine_from_3pts_exact():
    rng = np.random.RandomState(0)
    a_true = rng.uniform(-2, 2, (2, 3))
    src = rng.uniform(0, 100, (3, 2))
    dst = src @ a_true[:, :2].T + a_true[:, 2]
    a = affine_from_3pts(src, dst)
    np.testing.assert_allclose(a, a_true, atol=1e-9)


@pytest.mark.slow
def test_homography_roundtrip():
    rng = np.random.RandomState(1)
    h_true = np.eye(3) + rng.uniform(-0.1, 0.1, (3, 3))
    h_true /= h_true[2, 2]
    src = np.array([[0.0, 0], [100, 0], [100, 100], [0, 100]])
    dst = apply_homography(h_true, src)
    h = homography_from_4pts(src, dst)
    np.testing.assert_allclose(h, h_true, atol=1e-8)
    # matches cv2 if available
    import cv2
    h_cv = cv2.getPerspectiveTransform(src.astype(np.float32),
                                       dst.astype(np.float32))
    np.testing.assert_allclose(h, h_cv / h_cv[2, 2], atol=1e-4)


def test_warp_perspective_identity():
    rng = np.random.RandomState(2)
    img = rng.uniform(0, 1, (16, 20, 3)).astype(np.float32)
    out = warp_perspective(img, np.eye(3), (16, 20))
    np.testing.assert_allclose(out, img, atol=1e-5)


def _two_view_scene(n=200, outliers=0, seed=3):
    rng = np.random.RandomState(seed)
    k = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    pts = rng.uniform(-1, 1, (n, 3))
    pts[:, 2] = rng.uniform(3, 6, n)
    r = np.eye(3)
    t = np.array([0.5, 0.05, 0.0])
    p1 = (k @ pts.T).T
    p1 = p1[:, :2] / p1[:, 2:3]
    cam2 = (r @ pts.T).T + t
    p2 = (k @ cam2.T).T
    p2 = p2[:, :2] / p2[:, 2:3]
    if outliers:
        # corrupt the LAST `outliers` rows so tests know where they are
        p2[n - outliers:] += rng.uniform(30, 80, (outliers, 2))
    return p1, p2, k, r, t


def test_eight_point_matches_ground_truth_f():
    p1, p2, k, r, t = _two_view_scene()
    f = np.asarray(eight_point(p1[:50], p2[:50]))
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    f_true = np.linalg.inv(k).T @ tx @ r @ np.linalg.inv(k)
    f_true /= np.linalg.norm(f_true)
    # F is defined up to sign
    err = min(np.abs(f - f_true).max(), np.abs(f + f_true).max())
    assert err < 5e-4, err


@pytest.mark.slow
def test_ransac_fundamental_rejects_outliers():
    n_out = 40
    p1, p2, *_ = _two_view_scene(n=200, outliers=n_out)
    f, mask = find_fundamental_ransac(p1, p2, threshold=1.0,
                                      num_hypotheses=512, seed=0)
    # all outliers rejected, most inliers kept
    assert mask[-n_out:].sum() <= 2 or mask[:160].mean() > 0.9
    assert mask.sum() >= 120


def test_triangulate_rays_recovers_points():
    p1, p2, k, r, t = _two_view_scene(n=50)
    rng = np.random.RandomState(3)
    pts = rng.uniform(-1, 1, (50, 3))
    pts[:, 2] = rng.uniform(3, 6, 50)
    c2w_1 = np.eye(4)
    w2c_2 = np.eye(4)
    w2c_2[:3, :3] = r
    w2c_2[:3, 3] = t
    c2w_2 = np.linalg.inv(w2c_2)
    o1, d1 = pixel_rays(p1, k, c2w_1)
    o2, d2 = pixel_rays(p2, k, c2w_2)
    rec = triangulate_rays_midpoint(o1, d1, o2, d2)
    np.testing.assert_allclose(rec, pts, atol=1e-6)


def test_triangulate_corr_densifies_affine_flow():
    """Densifying sparse samples of an affine flow must reproduce it."""
    from cotr_tpu.inference.triangulate import triangulate_corr

    rng = np.random.RandomState(4)
    src = rng.uniform(0, 64, (60, 2))
    # include the corners so the hull covers the image
    src = np.concatenate([src, [[0, 0], [63, 0], [0, 63], [63, 63]]])
    a = np.array([[1.1, 0.05], [-0.03, 0.95]])
    b = np.array([5.0, -3.0])
    dst = src @ a.T + b
    corr = np.concatenate([src, dst], axis=1)
    flow = triangulate_corr(corr, (64, 64), (80, 80))
    assert flow.shape == (64, 64, 2)
    ys, xs = np.mgrid[0:64, 0:64]
    expect = np.stack([xs, ys], -1).reshape(-1, 2) @ a.T + b
    expect = expect.reshape(64, 64, 2)
    interior = (slice(4, -4), slice(4, -4))
    err = np.abs(flow[interior] - expect[interior])
    assert err.max() < 1.5, err.max()
