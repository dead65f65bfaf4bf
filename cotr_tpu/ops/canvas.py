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


def canvas_to_local(queries: Array) -> Tuple[Array, Array]:
    """Split canvas-normalized (x, y) into (side, local) where side=0 marks the
    left image, and local x is renormalized to [0, 1] within that image."""
    xp = jnp if isinstance(queries, jnp.ndarray) else np
    side = (queries[..., 0] >= 0.5).astype(xp.int32)
    local_x = xp.where(side == 1, (queries[..., 0] - 0.5) * 2,
                       queries[..., 0] * 2)
    return side, xp.stack([local_x, queries[..., 1]], axis=-1)


def local_to_canvas(local: Array, side: int) -> Array:
    """Inverse of canvas_to_local for a fixed side (0=left, 1=right)."""
    xp = jnp if isinstance(local, jnp.ndarray) else np
    x = local[..., 0] * 0.5 + (0.5 if side == 1 else 0.0)
    return xp.stack([x, local[..., 1]], axis=-1)
