"""Sampling / canvas op parity tests (grid_sample vs torch, resize vs PIL)."""

import numpy as np
import PIL.Image
import pytest
import torch

from cotr_tpu.ops import (crop_and_resize, grid_sample,
                          normalize_canvas, resize_bilinear,
                          two_images_side_by_side)


def test_grid_sample_matches_torch():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 1, (17, 23, 3)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (9, 11, 2)).astype(np.float32)

    ours = np.asarray(grid_sample(img, grid))

    t_img = torch.from_numpy(img.transpose(2, 0, 1))[None]
    t_grid = torch.from_numpy(grid)[None]
    theirs = torch.nn.functional.grid_sample(
        t_img, t_grid, mode="bilinear", padding_mode="zeros",
        align_corners=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_align_corners_matches_torch():
    rng = np.random.RandomState(1)
    img = rng.uniform(0, 1, (8, 8, 2)).astype(np.float32)
    grid = rng.uniform(-1, 1, (5, 5, 2)).astype(np.float32)
    ours = np.asarray(grid_sample(img, grid, align_corners=True))
    theirs = torch.nn.functional.grid_sample(
        torch.from_numpy(img.transpose(2, 0, 1))[None],
        torch.from_numpy(grid)[None], mode="bilinear",
        padding_mode="zeros", align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 64), (256, 256)),
                                          ((300, 300), (256, 256)),
                                          ((512, 512), (256, 256))])
def test_resize_matches_pil(in_hw, out_hw):
    """PIL-parity budget: <0.5/255 mean, small max error (SURVEY.md §7)."""
    rng = np.random.RandomState(2)
    img = rng.uniform(0, 255, in_hw + (3,)).astype(np.float32)
    ours = np.asarray(resize_bilinear(img, out_hw))
    pil = np.stack([
        np.array(PIL.Image.fromarray(img[..., c]).resize(
            out_hw[::-1], resample=PIL.Image.BILINEAR))
        for c in range(3)], axis=-1)
    err = np.abs(ours - pil)
    assert err.mean() < 0.5, err.mean()
    assert err.max() < 4.0, err.max()


def test_crop_and_resize_identity():
    """A crop of the full image resized to its own size is the image."""
    rng = np.random.RandomState(3)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    boxes = np.array([[0.0, 0.0, 32.0, 32.0]], np.float32)
    out = np.asarray(crop_and_resize(img, boxes, 32))[0]
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_crop_and_resize_upscale_matches_pil():
    """Upscaling (no anti-aliasing involved) should match PIL closely."""
    rng = np.random.RandomState(4)
    img = rng.uniform(0, 255, (64, 64, 1)).astype(np.float32)
    # crop the central 32x32, upscale to 128
    boxes = np.array([[16.0, 16.0, 32.0, 32.0]], np.float32)
    ours = np.asarray(crop_and_resize(img, boxes, 128))[0, ..., 0]
    pil = np.array(PIL.Image.fromarray(img[16:48, 16:48, 0]).resize(
        (128, 128), resample=PIL.Image.BILINEAR))
    np.testing.assert_allclose(ours, pil, atol=1e-2)


@pytest.mark.parametrize("box,out", [
    ((0, 0, 64, 64), 256),    # upscale
    ((16, 16, 32, 32), 128),  # crop + upscale
    ((0, 0, 512, 512), 128),  # anti-aliased downscale
    ((37, 21, 300, 300), 64), # crop + downscale
])
def test_crop_and_resize_matmul_exact_pil(box, out):
    """The separable-matmul crop must reproduce PIL BILINEAR exactly,
    including the anti-aliased downscale filter."""
    from cotr_tpu.ops import crop_and_resize_matmul
    import jax.numpy as jnp

    rng = np.random.RandomState(9)
    img = rng.uniform(0, 255, (512, 512, 3)).astype(np.float32)
    x0, y0, bw, bh = box
    boxes = np.array([[x0, y0, bw, bh]], np.float32)
    ours = np.asarray(crop_and_resize_matmul(jnp.asarray(img),
                                             jnp.asarray(boxes), out))[0]
    pil = np.stack([
        np.array(PIL.Image.fromarray(img[y0:y0 + bh, x0:x0 + bw, c]).resize(
            (out, out), resample=PIL.Image.BILINEAR)) for c in range(3)],
        axis=-1)
    assert np.abs(ours - pil).max() < 2e-3, np.abs(ours - pil).max()


@pytest.mark.parametrize("patch,out", [(64, 256), (300, 256), (128, 256),
                                       (32, 128)])
def test_crop_and_resize_windowed_matches_matmul(patch, out):
    """The static-window specialization (grouped-engine hot path) must match
    the full-image interpolation-matrix formulation exactly, including boxes
    clamped against the image borders."""
    import jax.numpy as jnp

    from cotr_tpu.ops import crop_and_resize_matmul, crop_and_resize_windowed

    rng = np.random.RandomState(11)
    img = rng.uniform(0, 255, (512, 480, 3)).astype(np.float32)
    h, w = img.shape[:2]
    # corner-clamped, interior, and edge-touching boxes of one shared size
    xs = np.array([0, w - patch, 17, (w - patch) // 2], np.float32)
    ys = np.array([0, h - patch, h - patch, 33], np.float32)
    boxes = np.stack([xs, ys, np.full(4, patch, np.float32),
                      np.full(4, patch, np.float32)], axis=1)
    full = np.asarray(crop_and_resize_matmul(jnp.asarray(img),
                                             jnp.asarray(boxes), out))
    windowed = np.asarray(crop_and_resize_windowed(jnp.asarray(img),
                                                   jnp.asarray(boxes), out,
                                                   patch))
    assert np.abs(full - windowed).max() < 1e-4, np.abs(full - windowed).max()


@pytest.mark.parametrize("window", [96, 160, 256])
def test_crop_and_resize_window_indexed_matches_matmul(window):
    """The multi-pair primitive (per-box image index, per-box sizes bounded
    by a static window) must match per-image crop_and_resize_matmul exactly:
    the wider window only adds zero-weight columns."""
    import jax.numpy as jnp

    from cotr_tpu.ops import (crop_and_resize_matmul,
                              crop_and_resize_window_indexed)

    rng = np.random.RandomState(13)
    imgs = rng.uniform(0, 255, (3, 320, 288, 3)).astype(np.float32)
    h, w = imgs.shape[1:3]
    # mixed sizes <= window, mixed image indices, border-clamped origins
    sizes = np.array([window, window - 16, 64, window // 2, 80], np.float32)
    xs = np.array([0, w - (window - 16), 17, 40, w - 80], np.float32)
    ys = np.array([h - window, 0, 33, h - window // 2, 5], np.float32)
    boxes = np.stack([xs, ys, sizes, sizes], axis=1)
    idx = np.array([0, 2, 1, 1, 0], np.int32)
    out = 128

    got = np.asarray(crop_and_resize_window_indexed(
        jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(idx), out, window))
    for k in range(len(boxes)):
        ref = np.asarray(crop_and_resize_matmul(
            jnp.asarray(imgs[idx[k]]), jnp.asarray(boxes[k:k + 1]), out))[0]
        assert np.abs(got[k] - ref).max() < 1e-4, \
            (k, np.abs(got[k] - ref).max())


def test_canvas_normalization_matches_torchvision_math():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 255, (8, 16, 3), dtype=np.uint8)
    out = normalize_canvas(img)
    expected = (img.astype(np.float32) / 255.0 -
                np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out, expected.astype(np.float32), atol=1e-6)


def test_side_by_side():
    a = np.ones((4, 4, 3))
    b = np.zeros((4, 4, 3))
    c = two_images_side_by_side(a, b)
    assert c.shape == (4, 8, 3)
    assert c[:, :4].all() and not c[:, 4:].any()


def test_grouped_stepper_fractional_boxes_use_generic_path():
    """Fractional-origin boxes must NOT select the windowed specialization
    (dynamic_slice floors starts, silently shifting crops); the stepper
    falls back to the full-image interpolation matrices."""
    from cotr_tpu.inference.grouped import GroupedStepper

    class _R:
        model = None

    stepper = GroupedStepper.__new__(GroupedStepper)
    intact = np.array([[10.0, 20.0, 64.0, 64.0]], np.float32)
    frac = np.array([[10.5, 20.25, 64.0, 64.0]], np.float32)
    assert stepper._step_for.__func__  # bound without __init__
    # integral boxes -> windowed key; fractional -> generic (None, None)
    stepper._sized_steps = {}
    stepper._step = "generic"
    stepper._make_step = lambda sf, st: ("windowed", sf, st)
    assert stepper._step_for(intact, intact) == ("windowed", 64, 64)
    assert stepper._step_for(frac, intact) == "generic"
    assert stepper._step_for(intact, frac) == "generic"


def test_zoom_ladder_schedule():
    """Depth-N ladder ends at the finest 0.0625 level for every depth (the
    shared helper behind eval_megadepth/eval_synthetic_pair; regression for
    the [:depth] truncation that silently dropped the finest zoom)."""
    from cotr_tpu.utils.constants import zoom_ladder

    assert zoom_ladder(1) == [0.0625]
    assert zoom_ladder(4) == [float(z) for z in np.linspace(0.5, 0.0625, 4)]
    for depth in range(1, 7):
        ladder = zoom_ladder(depth)
        assert len(ladder) == max(depth, 1)
        assert ladder[-1] == 0.0625
        assert all(a > b for a, b in zip(ladder, ladder[1:]))
