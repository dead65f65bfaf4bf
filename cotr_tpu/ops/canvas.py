"""Canvas construction: side-by-side composition + ImageNet normalization.

Reference equivalents: two_images_side_by_side
(COTR/inference/inference_helper.py:31-38) and the
to_tensor+normalize(mean, std) pipeline used everywhere a canvas is built
(refinement_task.py:120, cotr_dataset.py:113).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

from cotr_tpu.utils.constants import (CANVAS_H, CANVAS_W, IMAGENET_MEAN,
                                      IMAGENET_STD, MAX_SIZE)

Array = Union[np.ndarray, jnp.ndarray]


def two_images_side_by_side(img_a: Array, img_b: Array) -> Array:
    """Concatenate two equal-shaped HWC images along width."""
    assert img_a.shape == img_b.shape, f"{img_a.shape} vs {img_b.shape}"
    xp = jnp if isinstance(img_a, jnp.ndarray) else np
    return xp.concatenate([img_a, img_b], axis=1)


def normalize_canvas(canvas: Array) -> Array:
    """uint8/float HWC (or NHWC) canvas -> ImageNet-normalized float32.

    Matches torchvision to_tensor (/255 for uint8) + normalize, but stays HWC.
    """
    xp = jnp if isinstance(canvas, jnp.ndarray) else np
    x = xp.asarray(canvas, dtype=xp.float32)
    if canvas.dtype == np.uint8 or (hasattr(canvas, "dtype") and
                                    canvas.dtype == jnp.uint8):
        x = x / 255.0
    mean = xp.asarray(IMAGENET_MEAN, dtype=xp.float32)
    std = xp.asarray(IMAGENET_STD, dtype=xp.float32)
    return (x - mean) / std


def warp_homography_batch(images: jnp.ndarray,
                          h_mats: jnp.ndarray) -> jnp.ndarray:
    """Inverse-warp a batch of images through per-image homographies on
    device (bilinear, border-clamped) — jnp twin of
    ``cotr_tpu.data.synthetic._warp_host`` so synthetic-supervision warps
    can run inside the jitted train step instead of on the (single-core)
    host. images (B, H, W, C) float; h_mats (B, 3, 3) mapping src->dst.
    """
    b, h, w, c = images.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    pts = jnp.stack([xs.ravel(), ys.ravel(),
                     jnp.ones(h * w)], axis=0).astype(jnp.float32)
    src = jnp.linalg.inv(h_mats.astype(jnp.float32)) @ pts[None]  # (B,3,HW)
    sx = jnp.clip(src[:, 0] / src[:, 2], 0.0, w - 1.0)
    sy = jnp.clip(src[:, 1] / src[:, 2], 0.0, h - 1.0)
    x0 = jnp.minimum(sx.astype(jnp.int32), w - 2)
    y0 = jnp.minimum(sy.astype(jnp.int32), h - 2)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    flat = images.reshape(b, h * w, c)
    bidx = jnp.arange(b)[:, None]
    i00 = flat[bidx, y0 * w + x0]
    i01 = flat[bidx, y0 * w + x0 + 1]
    i10 = flat[bidx, (y0 + 1) * w + x0]
    i11 = flat[bidx, (y0 + 1) * w + x0 + 1]
    top = i00 + (i01 - i00) * fx
    bot = i10 + (i11 - i10) * fx
    return (top + (bot - top) * fy).reshape(b, h, w, c)


def canvas_from_crops_and_homographies(crops: jnp.ndarray,
                                       h_mats: jnp.ndarray,
                                       photo: jnp.ndarray = None
                                       ) -> jnp.ndarray:
    """(B, 256, 256, 3) uint8 source crops + (B, 3, 3) homographies ->
    normalized (B, 256, 512, 3) training canvases, entirely on device:
    warp B-side, side-by-side, ImageNet-normalize. Device-side synthetic
    supervision — the host only crops and does 3x3 math.

    ``photo`` (B, 2, 4) optional per-side photometric jitter [gain_rgb,
    bias]: applied independently to the A and B frames (geometry and thus
    supervision unchanged), so training must learn photometric invariance
    rather than pixel-identical matching.
    """
    a = crops.astype(jnp.float32) / 255.0
    b_img = warp_homography_batch(a, h_mats)
    if photo is not None:
        def jit_side(img, gb):  # gb: (B, 4)
            g = gb[:, None, None, :3]
            return jnp.clip(img * g + gb[:, None, None, 3:4], 0.0, 1.0)
        a = jit_side(a, photo[:, 0])
        b_img = jit_side(b_img, photo[:, 1])
    return normalize_canvas(jnp.concatenate([a, b_img], axis=2))


def denormalize_canvas(canvas: Array) -> Array:
    xp = jnp if isinstance(canvas, jnp.ndarray) else np
    mean = xp.asarray(IMAGENET_MEAN, dtype=xp.float32)
    std = xp.asarray(IMAGENET_STD, dtype=xp.float32)
    return canvas * std + mean


def make_canvas_batch(crops_a: Array, crops_b: Array) -> Array:
    """(N, 256, 256, 3) x2 -> normalized (N, 256, 512, 3) canvas batch."""
    xp = jnp if isinstance(crops_a, jnp.ndarray) else np
    canvas = xp.concatenate([crops_a, crops_b], axis=2)
    return normalize_canvas(canvas)
