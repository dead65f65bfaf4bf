"""Computer-vision solvers in numpy/JAX, replacing the reference's OpenCV
calls on the compute path (SURVEY.md §2.10 item 5):

* affine from 3 point pairs (cv2.getAffineTransform,
  inference_helper.py:155-156);
* homography from 4 pairs + bilinear warps (cv2.getPerspectiveTransform /
  warpPerspective, demo_homography.py:46-48);
* fundamental matrix via normalized 8-point inside a vmapped RANSAC loop
  (cv2.findFundamentalMat RANSAC, demo_guided_matching.py:63) — every
  hypothesis is solved in parallel on device;
* two-view midpoint triangulation (demo_reconstruction.py:24-31).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def affine_from_3pts(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact 2x3 affine A with dst = src @ A[:, :2].T + A[:, 2]."""
    src_h = np.concatenate([src, np.ones((3, 1))], axis=1)  # (3, 3)
    sol = np.linalg.solve(src_h, dst)  # (3, 2)
    return sol.T  # (2, 3)


def homography_from_4pts(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact 3x3 homography (DLT on 4 correspondences)."""
    a = []
    for (x, y), (u, v) in zip(src, dst):
        a.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        a.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
    a = np.asarray(a)
    _, _, vt = np.linalg.svd(a)
    h = vt[-1].reshape(3, 3)
    return h / h[2, 2]


def apply_homography(h: np.ndarray, pts: np.ndarray) -> np.ndarray:
    p = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=1)
    q = p @ h.T
    return q[:, :2] / q[:, 2:3]


def warp_perspective(img: np.ndarray, h: np.ndarray,
                     out_hw: Tuple[int, int]) -> np.ndarray:
    """Inverse-warp img through homography h onto an (out_h, out_w) grid
    (cv2.warpPerspective parity: output pixel p gets img[h^-1 p])."""
    from cotr_tpu.ops.sampling import _gather_bilinear

    oh, ow = out_hw
    ys, xs = jnp.mgrid[0:oh, 0:ow]
    pts = jnp.stack([xs.ravel(), ys.ravel(),
                     jnp.ones(oh * ow)], axis=1).astype(jnp.float32)
    hinv = jnp.asarray(np.linalg.inv(h), jnp.float32)
    src = pts @ hinv.T
    sx = (src[:, 0] / src[:, 2]).reshape(oh, ow)
    sy = (src[:, 1] / src[:, 2]).reshape(oh, ow)
    out = _gather_bilinear(jnp.asarray(img, jnp.float32), sx, sy,
                           zero_outside=True)
    return np.asarray(out)


# --------------------------------------------------------------- fundamental

def _normalize_pts(pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mean = pts.mean(axis=0)
    scale = jnp.sqrt(2.0) / jnp.maximum(
        jnp.mean(jnp.linalg.norm(pts - mean, axis=1)), 1e-8)
    t = jnp.array([[scale, 0, -scale * mean[0]],
                   [0, scale, -scale * mean[1]],
                   [0, 0, 1.0]])
    ph = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=1)
    return (ph @ t.T)[:, :2], t


def eight_point(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Normalized 8-point fundamental matrix from (8+, 2) pairs."""
    n1, t1 = _normalize_pts(p1)
    n2, t2 = _normalize_pts(p2)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    a = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=1)
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    f = vt[-1].reshape(3, 3)
    # enforce rank 2
    u, s, v = jnp.linalg.svd(f)
    f = (u * s.at[2].set(0.0)) @ v
    f = t2.T @ f @ t1
    # normalize by Frobenius norm — f[2,2] can be geometrically zero
    # (e.g. pure-translation motion), and Sampson distance is
    # scale-invariant anyway
    return f / jnp.maximum(jnp.linalg.norm(f), 1e-12)


def _sampson_dist(f: jnp.ndarray, p1: jnp.ndarray,
                  p2: jnp.ndarray) -> jnp.ndarray:
    ph1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=1)
    ph2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], axis=1)
    fx1 = ph1 @ f.T
    ftx2 = ph2 @ f
    num = jnp.sum(ph2 * fx1, axis=1) ** 2
    den = fx1[:, 0] ** 2 + fx1[:, 1] ** 2 + ftx2[:, 0] ** 2 + ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@partial(jax.jit, static_argnames=("num_hypotheses",))
def _ransac_fundamental_device(p1, p2, key, threshold, num_hypotheses):
    n = p1.shape[0]

    def one(k):
        idx = jax.random.choice(k, n, (8,), replace=False)
        f = eight_point(p1[idx], p2[idx])
        d = _sampson_dist(f, p1, p2)
        inliers = d < threshold
        return inliers.sum(), f

    keys = jax.random.split(key, num_hypotheses)
    counts, fs = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    f_best = fs[best]
    return f_best, _sampson_dist(f_best, p1, p2)


def find_fundamental_ransac(pts1: np.ndarray, pts2: np.ndarray,
                            threshold: float = 1.0,
                            num_hypotheses: int = 2048, seed: int = 0,
                            refine: bool = True
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """cv2.findFundamentalMat(FM_RANSAC) equivalent: all hypotheses solved in
    one vmapped device pass; optional final 8-point refit on the inliers.

    Returns (F, inlier_mask)."""
    assert pts1.shape[0] >= 8, "need at least 8 correspondences"
    p1 = jnp.asarray(pts1, jnp.float32)
    p2 = jnp.asarray(pts2, jnp.float32)
    f, d = _ransac_fundamental_device(p1, p2, jax.random.PRNGKey(seed),
                                      threshold, num_hypotheses)
    mask = np.asarray(d) < threshold
    if refine and mask.sum() >= 8:
        f = eight_point(p1[np.where(mask)[0]], p2[np.where(mask)[0]])
        mask = np.asarray(_sampson_dist(f, p1, p2)) < threshold
    return np.asarray(f), mask


# -------------------------------------------------------------- triangulation

def triangulate_rays_midpoint(origins_a: np.ndarray, dirs_a: np.ndarray,
                              origins_b: np.ndarray, dirs_b: np.ndarray
                              ) -> np.ndarray:
    """Closed-form midpoint of the common perpendicular of two ray bundles
    (demo_reconstruction.py:24-31). All inputs (N, 3)."""
    da = dirs_a / np.linalg.norm(dirs_a, axis=1, keepdims=True)
    db = dirs_b / np.linalg.norm(dirs_b, axis=1, keepdims=True)
    w0 = origins_a - origins_b
    a = np.sum(da * da, axis=1)
    b = np.sum(da * db, axis=1)
    c = np.sum(db * db, axis=1)
    d = np.sum(da * w0, axis=1)
    e = np.sum(db * w0, axis=1)
    denom = a * c - b * b
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    s = (b * e - c * d) / denom
    t = (a * e - b * d) / denom
    pa = origins_a + s[:, None] * da
    pb = origins_b + t[:, None] * db
    return 0.5 * (pa + pb)


def pixel_rays(pts_xy: np.ndarray, intrinsic: np.ndarray,
               camera_to_world: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Back-project pixels to world-space rays: (origins, directions)."""
    n = pts_xy.shape[0]
    ph = np.concatenate([pts_xy, np.ones((n, 1))], axis=1)
    dirs_cam = (np.linalg.inv(intrinsic) @ ph.T).T
    r = camera_to_world[:3, :3]
    t = camera_to_world[:3, 3]
    dirs_world = (r @ dirs_cam.T).T
    origins = np.broadcast_to(t, (n, 3))
    return origins, dirs_world
