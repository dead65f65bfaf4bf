"""Synthetic homography dataset: shapes, determinism, GT consistency."""

import numpy as np
import pytest

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


def test_device_warp_matches_host_warp():
    """device_warp mode must produce the same training canvas as host-warp
    mode (same (seed, index) -> same crop/homography/corrs), with the warp
    done inside jit (ops.canvas.canvas_from_crops_and_homographies)."""
    import jax
    import jax.numpy as jnp

    from cotr_tpu.ops.canvas import (canvas_from_crops_and_homographies,
                                     normalize_canvas)

    host_ds = SyntheticHomographyDataset(length=8, num_kp=16, seed=5)
    dev_ds = SyntheticHomographyDataset(length=8, num_kp=16, seed=5,
                                        device_warp=True)
    for i in range(4):
        hs = host_ds[i]
        dv = dev_ds[i]
        np.testing.assert_allclose(hs["queries"], dv["queries"], atol=1e-6)
        np.testing.assert_allclose(hs["targets"], dv["targets"], atol=1e-6)
        canvas_host = normalize_canvas(hs["image"])
        canvas_dev = np.asarray(jax.jit(canvas_from_crops_and_homographies)(
            jnp.asarray(dv["crop"][None]), jnp.asarray(dv["h_mat"][None])))[0]
        # host path rounds the warped B side to uint8; device path stays
        # float -> at most 0.5/255 pre-normalization difference
        err = np.abs(canvas_host - canvas_dev).max()
        assert err < 0.02, f"sample {i}: canvas mismatch {err}"


@pytest.mark.slow
def test_train_step_accepts_crop_layout():
    """One jitted train step on the {crop, h_mat} batch layout."""
    import jax
    import jax.numpy as jnp

    from cotr_tpu import COTRConfig, TrainConfig, build_model
    from cotr_tpu.training.train_step import (create_train_state,
                                              make_train_step)

    ds = SyntheticHomographyDataset(length=4, num_kp=8, seed=2,
                                    device_warp=True)
    batch = {k: np.stack([ds[i][k] for i in range(2)])
             for k in ("crop", "h_mat", "queries", "targets")}
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = build_model(COTRConfig(enc_layers=1, dec_layers=1, dropout=0.0))
    cfg = TrainConfig(batch_size=2)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), jbatch)
    step = make_train_step(model, tx, cfg)
    state, metrics = step(state, jbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_zoom_mode_content_consistency():
    """Zoom-crop pairs (stage-3 analog) must still put corresponding CONTENT
    at the labeled points, across the whole zoom ladder, and must differ
    from the flat-scale sample (the crops actually zoom)."""
    from scipy.ndimage import map_coordinates

    ds = SyntheticHomographyDataset(length=24, num_kp=50, seed=2,
                                    max_corner_jitter=0.1, raw_uint8=False,
                                    zoom=True)
    flat = SyntheticHomographyDataset(length=24, num_kp=50, seed=2,
                                      max_corner_jitter=0.1, raw_uint8=False)
    changed = 0
    for idx in range(6):
        s = ds[idx]
        img = s["image"]
        corrs = s["corrs"] * np.array([512, 256, 512, 256])
        a_gray = img[:, :256].mean(-1)
        b_gray = img[:, 256:].mean(-1)
        va = map_coordinates(a_gray, [corrs[:, 1], corrs[:, 0]], order=1)
        vb = map_coordinates(b_gray, [corrs[:, 3], corrs[:, 2] - 256],
                             order=1)
        # tolerant: zoomed crops resample twice; compare robustly
        # (values are ImageNet-normalized, spread ~[-2.6, 2.6])
        assert np.median(np.abs(va - vb)) < 0.2, (idx, np.median(
            np.abs(va - vb)))
        assert (np.abs(va - vb) < 0.35).mean() > 0.7, idx
        if not np.array_equal(img, flat[idx]["image"]):
            changed += 1
    assert changed >= 4  # most samples actually zoomed


def test_default_textures_exclude_eval_images():
    """The held-out eval textures (cathedral pair, tools/eval_synthetic_pair)
    must NOT be in the default training set (VERDICT r3 weak #1: texture
    leak made the committed accuracy numbers overstate generalization)."""
    ds = SyntheticHomographyDataset(length=2, num_kp=8)
    assert len(ds.images) >= 5  # still a usable texture pool
    import glob
    import PIL.Image
    for name in SyntheticHomographyDataset.EVAL_TEXTURES:
        paths = glob.glob(f"/root/reference/sample_data/imgs/{name}")
        assert paths, name
        held = np.array(PIL.Image.open(paths[0]).convert("RGB"))
        for img in ds.images:
            assert img.shape != held.shape or not np.array_equal(img, held)


def test_rot_scale_augmentation_content_consistency():
    """Rotation/scale composed into h_mat must keep labeled corrs on the
    same content, and must actually change the B frame."""
    from scipy.ndimage import map_coordinates

    aug = SyntheticHomographyDataset(length=8, num_kp=50, seed=3,
                                     max_corner_jitter=0.05, raw_uint8=False,
                                     rot_deg=20.0, scale_range=(0.8, 1.25))
    plain = SyntheticHomographyDataset(length=8, num_kp=50, seed=3,
                                       max_corner_jitter=0.05,
                                       raw_uint8=False)
    changed = 0
    for idx in range(4):
        s = aug[idx]
        img = s["image"]
        corrs = s["corrs"] * np.array([512, 256, 512, 256])
        a_gray = img[:, :256].mean(-1)
        b_gray = img[:, 256:].mean(-1)
        va = map_coordinates(a_gray, [corrs[:, 1], corrs[:, 0]], order=1)
        vb = map_coordinates(b_gray, [corrs[:, 3], corrs[:, 2] - 256],
                             order=1)
        assert (np.abs(va - vb) < 0.35).mean() > 0.75, idx
        if not np.array_equal(img, plain[idx]["image"]):
            changed += 1
    assert changed >= 3


@pytest.mark.slow
def test_photo_jitter_host_device_twins_agree():
    """Photometric jitter: host-path pixels must match the device-path
    canvas (canvas_from_crops_and_homographies with `photo`), and the
    supervision (queries/targets) must be unchanged by jitter."""
    import jax
    import jax.numpy as jnp

    from cotr_tpu.ops.canvas import (canvas_from_crops_and_homographies,
                                     normalize_canvas)

    host_ds = SyntheticHomographyDataset(length=8, num_kp=16, seed=7,
                                         photo_jitter=0.3)
    dev_ds = SyntheticHomographyDataset(length=8, num_kp=16, seed=7,
                                        photo_jitter=0.3, device_warp=True)
    plain = SyntheticHomographyDataset(length=8, num_kp=16, seed=7)
    jitted = 0
    for i in range(3):
        hs, dv = host_ds[i], dev_ds[i]
        assert dv["photo"].shape == (2, 4)
        # geometry identical across host/device paths (jitter draws shift
        # the RNG stream, so geometry is NOT comparable to the plain
        # dataset — host==device is the invariant that matters)
        np.testing.assert_allclose(hs["queries"], dv["queries"], atol=1e-6)
        np.testing.assert_allclose(hs["targets"], dv["targets"], atol=1e-6)
        canvas_host = normalize_canvas(hs["image"])
        canvas_dev = np.asarray(jax.jit(canvas_from_crops_and_homographies)(
            jnp.asarray(dv["crop"][None]), jnp.asarray(dv["h_mat"][None]),
            jnp.asarray(dv["photo"][None])))[0]
        err = np.abs(canvas_host - canvas_dev).max()
        assert err < 0.05, f"sample {i}: canvas mismatch {err}"
        if not np.array_equal(hs["image"], plain[i]["image"]):
            jitted += 1
    assert jitted >= 2  # jitter actually applied


@pytest.mark.slow
def test_train_step_accepts_photo_key():
    """One jitted train step on the {crop, h_mat, photo} layout."""
    import jax
    import jax.numpy as jnp

    from cotr_tpu import COTRConfig, TrainConfig, build_model
    from cotr_tpu.training.train_step import (create_train_state,
                                              make_train_step)

    ds = SyntheticHomographyDataset(length=4, num_kp=8, seed=2,
                                    device_warp=True, photo_jitter=0.2,
                                    rot_deg=10.0, scale_range=(0.9, 1.1))
    batch = {k: np.stack([ds[i][k] for i in range(2)])
             for k in ("crop", "h_mat", "photo", "queries", "targets")}
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = build_model(COTRConfig(enc_layers=1, dec_layers=1, dropout=0.0))
    cfg = TrainConfig(batch_size=2)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), jbatch)
    step = make_train_step(model, tx, cfg)
    state, metrics = step(state, jbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_procedural_textures_widen_pool_deterministically():
    """proc_textures appends seed-deterministic fractal textures; samples
    drawn from them keep exact-warp supervision (GT is the homography, not
    the texture)."""
    from cotr_tpu.data.synthetic import make_procedural_texture

    rng = np.random.RandomState(3)
    tex = make_procedural_texture(rng, size=256)
    assert tex.shape == (256, 256, 3) and tex.dtype == np.uint8
    # contour-rich: gradient energy well above a flat image
    g = np.abs(np.diff(tex.astype(np.float32), axis=0)).mean()
    assert g > 1.0, g

    a = SyntheticHomographyDataset(length=4, num_kp=16, seed=9,
                                   proc_textures=8)
    b = SyntheticHomographyDataset(length=4, num_kp=16, seed=9,
                                   proc_textures=8)
    assert len(a.images) == len(b.images)
    for ia, ib in zip(a.images[-8:], b.images[-8:]):
        np.testing.assert_array_equal(ia, ib)
    s = a[0]
    assert s["image"].shape == (MAX_SIZE, 2 * MAX_SIZE, 3)


def test_tex_aug_preserves_supervision_geometry():
    """Channel permutation / flips happen in TEXTURE space before the warp:
    the content-consistency property (targets land on the same content)
    must keep holding."""
    from scipy.ndimage import map_coordinates

    ds = SyntheticHomographyDataset(length=6, num_kp=50, seed=2,
                                    max_corner_jitter=0.1, raw_uint8=False,
                                    tex_aug=True, proc_textures=4)
    changed = 0
    plain = SyntheticHomographyDataset(length=6, num_kp=50, seed=2,
                                       max_corner_jitter=0.1,
                                       raw_uint8=False)
    for i in range(4):
        s = ds[i]
        img = s["image"]
        corrs = s["corrs"] * np.array([512, 256, 512, 256])
        a_gray = img[:, :256].mean(-1)
        b_gray = img[:, 256:].mean(-1)
        va = map_coordinates(a_gray, [corrs[:, 1], corrs[:, 0]], order=1)
        vb = map_coordinates(b_gray, [corrs[:, 3], corrs[:, 2] - 256],
                             order=1)
        assert (np.abs(va - vb) < 0.35).mean() > 0.8
        if not np.array_equal(s["image"], plain[i]["image"]):
            changed += 1
    assert changed >= 2  # augmentation actually applied


def test_procedural_textures_large_seed():
    """Seeds like the val split's 777 must not overflow RandomState
    (seed*multiplier is reduced mod 2**32)."""
    ds = SyntheticHomographyDataset(length=2, num_kp=8, seed=777,
                                    proc_textures=2)
    assert ds[0]["image"].shape == (MAX_SIZE, 2 * MAX_SIZE, 3)
