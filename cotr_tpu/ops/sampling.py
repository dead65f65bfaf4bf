"""Bilinear sampling / crop-and-resize primitives (pure jnp, XLA-fused).

These replace the native resampling code the reference delegates to:

* ``torch.nn.functional.grid_sample`` used for cycle-consistency confidence and
  flow resampling (reference COTR/inference/inference_helper.py:139,178-181)
  -> :func:`grid_sample`;
* PIL bilinear crop->256 resampling on the inference hot path (reference
  refinement_task.py:117-118, utils/utils.py:69-83) ->
  :func:`crop_and_resize_matmul` (exact PIL triangle filter as MXU matmuls;
  :func:`crop_and_resize` is the simple non-anti-aliased gather variant).

Coordinate conventions:

* ``grid_sample`` matches torch semantics with ``align_corners=False``:
  a normalized coordinate g in [-1, 1] maps to pixel coordinate
  ((g + 1) * size - 1) / 2; out-of-range samples use zero padding.
* ``crop_and_resize`` matches PIL's center-aligned mapping: output pixel
  center (i + 0.5) maps to input coordinate (i + 0.5) * (in / out) - 0.5;
  ``crop_and_resize_matmul`` additionally widens the filter when downscaling
  exactly as PIL does (anti-aliasing).
"""

from __future__ import annotations


from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _gather_bilinear(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     zero_outside: bool = True) -> jnp.ndarray:
    """Sample image (H, W, C) at float pixel coords x, y (any shape).

    Out-of-range reads clamp for the gather; ``zero_outside`` masks the result
    to zero where the *sample point* falls outside torch's zero-padding
    validity window (matching grid_sample padding_mode='zeros').
    """
    image = jnp.asarray(image)
    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]

    x0f = x0.astype(jnp.int32)
    y0f = y0.astype(jnp.int32)
    x0i = jnp.clip(x0f, 0, w - 1)
    x1i = jnp.clip(x0f + 1, 0, w - 1)
    y0i = jnp.clip(y0f, 0, h - 1)
    y1i = jnp.clip(y0f + 1, 0, h - 1)

    # Zero-padding: each corner contributes only if it lies inside the image.
    def corner(xi, yi, xf, yf):
        val = image[yi, xi]
        if zero_outside:
            inside = ((xf >= 0) & (xf <= w - 1) & (yf >= 0) & (yf <= h - 1))
            val = val * inside[..., None]
        return val

    v00 = corner(x0i, y0i, x0, y0)
    v01 = corner(x1i, y0i, x0 + 1, y0)
    v10 = corner(x0i, y1i, x0, y0 + 1)
    v11 = corner(x1i, y1i, x0 + 1, y0 + 1)

    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = False) -> jnp.ndarray:
    """torch.nn.functional.grid_sample parity (bilinear, zero padding).

    image: (H, W, C); grid: (..., 2) normalized (x, y) in [-1, 1].
    Returns (..., C).
    """
    h, w = image.shape[0], image.shape[1]
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1) * 0.5 * (w - 1)
        y = (gy + 1) * 0.5 * (h - 1)
    else:
        x = ((gx + 1) * w - 1) * 0.5
        y = ((gy + 1) * h - 1) * 0.5
    return _gather_bilinear(image, x, y, zero_outside=True)


def resize_bilinear(image: jnp.ndarray, out_hw: Tuple[int, int],
                    antialias: bool = True) -> jnp.ndarray:
    """PIL-parity full-image resize; thin wrapper over jax.image.resize.

    jax.image.resize with ``antialias=True`` and the 'linear' method uses the
    same center-aligned triangle filter PIL uses, so it matches
    PIL.Image.resize(..., BILINEAR) to ~1e-3 for float inputs
    (verified in tests/test_ops.py).
    """
    out_shape = (out_hw[0], out_hw[1]) + image.shape[2:]
    return jax.image.resize(image, out_shape, method="linear",
                            antialias=antialias)


def crop_and_resize(image: jnp.ndarray, boxes: jnp.ndarray,
                    out_size: int) -> jnp.ndarray:
    """Crop axis-aligned boxes and resize each to (out_size, out_size).

    image: (H, W, C). boxes: (N, 4) as (x0, y0, w, h) in pixels (float).
    Returns (N, out_size, out_size, C). Plain bilinear (no anti-aliasing);
    see :func:`crop_and_resize_pyramid` for the anti-aliased variant.

    The sampling grid reproduces PIL's mapping for a crop of size (bw, bh)
    resized to out_size: src = x0 + (i + 0.5) * bw / out - 0.5.
    """
    n = boxes.shape[0]
    idx = (jnp.arange(out_size, dtype=image.dtype) + 0.5) / out_size

    def one(box):
        x0, y0, bw, bh = box[0], box[1], box[2], box[3]
        # Clamp to the box interior: the reference crops the array first and
        # PIL edge-replicates at crop borders, so samples never read pixels
        # outside the box.
        xs = jnp.clip(x0 + idx * bw - 0.5, x0, x0 + bw - 1)
        ys = jnp.clip(y0 + idx * bh - 0.5, y0, y0 + bh - 1)
        gx, gy = jnp.meshgrid(xs, ys)
        return _gather_bilinear(image, gx, gy, zero_outside=False)

    return jax.vmap(one)(boxes)


def _pil_axis_weights(starts: jnp.ndarray, sizes: jnp.ndarray,
                      in_extent: int, out_size: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Per-box separable PIL-BILINEAR interpolation matrix (G, out, in).

    Exactly PIL's triangle filter on a crop [start, start+size) resized to
    out_size: filter scale = max(size/out, 1) (anti-aliasing on downscale),
    window clipped to the crop, weights renormalized over the clipped
    support. starts/sizes are integer-valued floats (reference patches are
    integer-aligned, inference_helper.py:78-102).
    """
    scale = sizes / out_size  # (G,)
    filt = jnp.maximum(scale, 1.0)
    centers = (starts[:, None] +
               (jnp.arange(out_size, dtype=dtype)[None] + 0.5) * scale[:, None])
    ys = jnp.arange(in_extent, dtype=dtype)  # pixel centers at y + 0.5
    d = jnp.abs(ys[None, None, :] + 0.5 - centers[..., None]) / \
        filt[:, None, None]
    w = jnp.maximum(0.0, 1.0 - d)
    inbox = ((ys[None, :] >= starts[:, None]) &
             (ys[None, :] <= starts[:, None] + sizes[:, None] - 1))
    w = w * inbox[:, None, :]
    return w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)


def crop_and_resize_matmul(image: jnp.ndarray, boxes: jnp.ndarray,
                           out_size: int,
                           compute_dtype=jnp.float32) -> jnp.ndarray:
    """PIL-parity anti-aliased crop-and-resize as two dense matmuls (MXU).

    The separable triangle filter makes resampling a pair of interpolation-
    matrix products: out[g] = Wy[g] @ img @ Wx[g]^T per channel. On TPU this
    replaces millions of scalar gathers with einsums that run on the systolic
    array — the hot op of the zoom engine (SURVEY.md §7 "on-device crop
    gather ... the performance crux").

    image: (H, W, C); boxes: (G, 4) integer-valued (x0, y0, w, h).
    Returns (G, out_size, out_size, C) in float32.
    """
    image = jnp.asarray(image)
    h, w = image.shape[0], image.shape[1]
    wy = _pil_axis_weights(boxes[:, 1], boxes[:, 3], h, out_size)  # (G,o,H)
    wx = _pil_axis_weights(boxes[:, 0], boxes[:, 2], w, out_size)  # (G,o,W)
    img = image.astype(compute_dtype)
    wy = wy.astype(compute_dtype)
    wx = wx.astype(compute_dtype)
    tmp = jnp.einsum("giy,yxc->gixc", wy, img,
                     precision=jax.lax.Precision.HIGHEST
                     if compute_dtype == jnp.float32 else None)
    out = jnp.einsum("gjx,gixc->gijc", wx, tmp,
                     precision=jax.lax.Precision.HIGHEST
                     if compute_dtype == jnp.float32 else None)
    return out.astype(jnp.float32)


def crop_and_resize_window_indexed(images: jnp.ndarray, boxes: jnp.ndarray,
                                   idx: jnp.ndarray, out_size: int,
                                   window: int,
                                   compute_dtype=jnp.float32) -> jnp.ndarray:
    """PIL-parity crop-and-resize from a STACK of images with per-box image
    indices and per-box integral sizes bounded by a static ``window``.

    The multi-pair grouped engine's crop primitive: squads from DIFFERENT
    image pairs share one dispatch (the reference engine handles exactly one
    pair per call, sparse_engine.py:197; batching pairs is the throughput
    lever its serial eval loop leaves unused). Each box slices a static
    (window, window) region from its own image — window is quantized to a
    small ladder by the caller so patch sizes that differ across pairs do
    not multiply compilations — and is resampled by per-box triangle-filter
    matrices clipped to the true box, exactly like
    :func:`crop_and_resize_matmul` (zero-weight window columns contribute
    exact zeros, so the wider window changes nothing).

    images: (P, H, W, C); boxes: (G, 4) integer-valued (x0, y0, w, h) with
    w, h <= window <= min(H, W); idx: (G,) int32 image index per box.
    Returns (G, out_size, out_size, C) float32.
    """
    images = jnp.asarray(images)
    h, w_img, c = images.shape[1], images.shape[2], images.shape[3]
    img = images.astype(compute_dtype)
    bx, by = boxes[:, 0], boxes[:, 1]
    # window origin: clamped so the static slice stays inside the image;
    # the true box then sits at offset (bx - wx0, by - wy0) in the window
    wx0 = jnp.clip(bx, 0.0, float(w_img - window))
    wy0 = jnp.clip(by, 0.0, float(h - window))

    def one(i, x0, y0):
        return jax.lax.dynamic_slice(
            img, (i.astype(jnp.int32), y0.astype(jnp.int32),
                  x0.astype(jnp.int32), 0),
            (1, window, window, c))[0]

    wins = jax.vmap(one)(jnp.asarray(idx), wx0, wy0)  # (G, S, S, C)
    wy = _pil_axis_weights(by - wy0, boxes[:, 3], window, out_size)
    wx = _pil_axis_weights(bx - wx0, boxes[:, 2], window, out_size)
    wy = wy.astype(compute_dtype)
    wx = wx.astype(compute_dtype)
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else None)
    tmp = jnp.einsum("giy,gyxc->gixc", wy, wins, precision=prec)
    out = jnp.einsum("gjx,gixc->gijc", wx, tmp, precision=prec)
    return out.astype(jnp.float32)


def crop_and_resize_windowed(image: jnp.ndarray, boxes: jnp.ndarray,
                             out_size: int, patch: int,
                             compute_dtype=jnp.float32) -> jnp.ndarray:
    """PIL-parity crop-and-resize for boxes sharing one STATIC patch size.

    Within one grouped-engine dispatch every box has the same side length
    (``patch_box`` derives it from (zoom scale, image dims) alone —
    reference inference_helper.py:78-102), so instead of per-box
    interpolation matrices over the FULL image (``crop_and_resize_matmul``,
    cost G*out*H*W*C) each patch window is sliced out first and resampled
    with a single shared (out, patch) weight pair: cost G*out*patch^2*C —
    a (H*W)/patch^2 FLOP cut (4x at zoom 0.5, 64x at zoom 0.125).

    Bit-identical to ``crop_and_resize_matmul``: the triangle filter's
    support is clipped to the crop and renormalized in both formulations,
    so slicing exactly the crop loses nothing.

    image: (H, W, C); boxes: (G, 4) integer-valued (x0, y0, w, h) with
    w == h == patch. Returns (G, out_size, out_size, C) float32.
    """
    image = jnp.asarray(image)
    c = image.shape[2]
    img = image.astype(compute_dtype)

    def one(box):
        return jax.lax.dynamic_slice(
            img, (box[1].astype(jnp.int32), box[0].astype(jnp.int32), 0),
            (patch, patch, c))

    wins = jax.vmap(one)(boxes)  # (G, S, S, C)
    w = _pil_axis_weights(jnp.zeros((1,)), jnp.full((1,), float(patch)),
                          patch, out_size)[0]  # (out, S)
    w = w.astype(compute_dtype)
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else None)
    tmp = jnp.einsum("iy,gyxc->gixc", w, wins, precision=prec)
    out = jnp.einsum("jx,gixc->gijc", w, tmp, precision=prec)
    return out.astype(jnp.float32)

