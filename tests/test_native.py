"""C++ data-path library vs the Python reference implementations."""

import os
import textwrap

import numpy as np
import pytest

from cotr_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _fake_captures():
    """Two synthetic RGBD cameras looking at a textured plane."""
    from cotr_tpu.geometry.camera import CameraPose, PinholeCamera

    class Cap:
        pass

    rng = np.random.RandomState(0)
    h, w = 48, 64
    cam = PinholeCamera(w, h, 60.0, 60.0, w / 2, h / 2)

    a = Cap()
    a.pinhole_cam = cam
    a.cam_pose = CameraPose.from_world_to_camera(np.eye(4))
    a.depth_map = rng.uniform(2.0, 4.0, (h, w)).astype(np.float32)
    a.depth_map[rng.rand(h, w) < 0.3] = 0.0  # holes
    a.image = np.zeros((h, w, 3), np.uint8)

    b = Cap()
    b.pinhole_cam = cam
    w2c = np.eye(4)
    w2c[:3, 3] = [0.2, -0.1, 0.05]
    b.cam_pose = CameraPose.from_world_to_camera(w2c)
    # give b a generous depth so occlusion check passes for most points
    b.depth_map = np.full((h, w), 3.0, np.float32)
    b.image = np.zeros((h, w, 3), np.uint8)
    return a, b


def test_synth_corrs_matches_python():
    from cotr_tpu.data.dataset import compute_corrs

    a, b = _fake_captures()
    py = compute_corrs(a, b)
    nat = native.synth_corrs(
        a.depth_map,
        np.linalg.inv(a.pinhole_cam.intrinsic_mat),
        a.cam_pose.camera_to_world,
        b.pinhole_cam.intrinsic_mat @ b.cam_pose.world_to_camera[0:3, :],
        b.depth_map)
    assert nat is not None
    if py is None:
        assert nat.shape[0] == 0
        return
    assert nat.shape == py.shape, (nat.shape, py.shape)
    np.testing.assert_allclose(nat, py, atol=1e-4)


def test_parse_images_txt_matches_python(tmp_path):
    from cotr_tpu.data.colmap import read_images_meta

    content = textwrap.dedent("""\
        # Image list with two lines of data per image:
        #   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME
        #   POINTS2D[] as (X, Y, POINT3D_ID)
        # Number of images: 2, mean observations per image: 1.5
        7 0.9689 0.0296 -0.2090 -0.1281 2.5 0.1 1.5 1 img_a.jpg
        1.0 2.0 -1 3.0 4.0 5
        9 1.0 0.0 0.0 0.0 -1.0 0.0 0.25 2 sub/img_b.jpg
        """)
    p = tmp_path / "images.txt"
    p.write_text(content)

    out = native.parse_images_txt(str(p))
    assert out is not None
    ids, cam_ids, qt, names = out
    assert list(ids) == [7, 9]
    assert list(cam_ids) == [1, 2]
    assert names == ["img_a.jpg", "sub/img_b.jpg"]
    np.testing.assert_allclose(
        qt[0], [0.9689, 0.0296, -0.2090, -0.1281, 2.5, 0.1, 1.5])

    metas = read_images_meta(str(p), str(tmp_path), require_files=False)
    assert sorted(metas.keys()) == [7, 9]
    np.testing.assert_allclose(metas[7].t.translation_vector, [2.5, 0.1, 1.5])


def test_synth_corrs_perf_sanity():
    """The native loop should chew a 480x640 depth map in well under 100ms."""
    import time

    a, b = _fake_captures()
    a.depth_map = np.tile(a.depth_map, (10, 10))[:480, :640]
    b.depth_map = np.full((480, 640), 3.0, np.float32)
    t0 = time.time()
    out = native.synth_corrs(
        a.depth_map,
        np.linalg.inv(a.pinhole_cam.intrinsic_mat),
        a.cam_pose.camera_to_world,
        b.pinhole_cam.intrinsic_mat @ b.cam_pose.world_to_camera[0:3, :],
        b.depth_map)
    dt = time.time() - t0
    assert out is not None
    assert dt < 0.5, f"native synth too slow: {dt:.3f}s"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_form_squads_native_matches_numpy(seed):
    """The grid-bucketed C++ squad formation must reproduce the numpy greedy
    scan EXACTLY (same permutation order): same pilot set, same membership,
    including clamped-patch pilots whose own center fails the window test
    and max_load truncation."""
    from cotr_tpu.inference.grouped import (_form_squads_numpy, patch_box_np,
                                            SAFE_AREA)

    rng = np.random.RandomState(seed)
    t = 700
    h_a, w_a, h_b, w_b = 480, 640, 512, 512
    loc_from = np.stack([rng.uniform(0, w_a, t), rng.uniform(0, h_a, t)], 1)
    loc_to = np.stack([rng.uniform(0, w_b, t), rng.uniform(0, h_b, t)], 1)
    active = rng.rand(t) < 0.8
    scale_f, scale_t = 0.3, 0.45
    max_load = 16  # small so truncation paths trigger

    x0f, y0f, sf = patch_box_np(loc_from, scale_f, h_a, w_a)
    x0t, y0t, st = patch_box_np(loc_to, scale_t, h_b, w_b)
    cf_x, cf_y = x0f + sf / 2, y0f + sf / 2
    ct_x, ct_y = x0t + st / 2, y0t + st / 2
    half_f, half_t = sf / 2 * SAFE_AREA, st / 2 * SAFE_AREA
    ids = np.where(active)[0]
    order = ids[rng.permutation(len(ids))]

    ref_sq, ref_pilots = _form_squads_numpy(
        loc_from, loc_to, active, cf_x, cf_y, ct_x, ct_y,
        half_f, half_t, order, max_load)
    out = native.form_squads(loc_from, loc_to, cf_x, cf_y, ct_x, ct_y,
                             active, half_f, half_t, order, max_load)
    if out is None:
        pytest.skip("native library unavailable")
    nat_sq, nat_pilots = out
    np.testing.assert_array_equal(nat_pilots, ref_pilots)
    np.testing.assert_array_equal(nat_sq, ref_sq)


def test_form_squads_pilot_always_in_own_squad():
    """Overloaded window: when more than max_load free tasks fall in one
    pilot window and the pilot's id sorts past the cap, the pilot must STILL
    be a member of its own squad (reference sparse_engine.py:316 claims the
    pilot before the window scan; a pilot with no update at the final zoom
    would freeze at its unrefined value through the revisit check). Squads
    hold the pilot + up to max_load others."""
    from cotr_tpu.inference.grouped import _form_squads_numpy

    t = 40
    max_load = 8
    # all tasks at nearly the same spot -> one giant window; pilot id = 30
    # sorts far past max_load among the ascending member ids
    loc = np.full((t, 2), 100.0) + np.arange(t)[:, None] * 1e-3
    active = np.ones(t, bool)
    order = np.array([30] + [i for i in range(t) if i != 30])
    args = (loc, loc, active, loc[:, 0], loc[:, 1], loc[:, 0], loc[:, 1],
            50.0, 50.0, order, max_load)
    sq, pilots = _form_squads_numpy(*args)
    assert pilots[0] == 30
    assert sq[30] == 0, "pilot truncated out of its own squad"
    assert (sq == 0).sum() == max_load + 1  # pilot + max_load others
    out = native.form_squads(loc, loc, loc[:, 0], loc[:, 1],
                             loc[:, 0], loc[:, 1], active, 50.0, 50.0,
                             order, max_load)
    if out is not None:
        np.testing.assert_array_equal(out[0], sq)
        np.testing.assert_array_equal(out[1], pilots)


def test_form_squads_native_degenerate_half_width():
    """half_f ~ 0 (zero patch size or safe_area -> 0) must not abort the
    process: the grid clamps at span/2048 per axis and every pilot becomes
    a singleton squad, matching the numpy scan."""
    from cotr_tpu.inference.grouped import _form_squads_numpy

    rng = np.random.RandomState(0)
    t = 64
    loc = np.stack([rng.uniform(0, 500, t), rng.uniform(0, 400, t)], 1)
    active = np.ones(t, bool)
    order = np.arange(t)
    out = native.form_squads(loc, loc, loc[:, 0], loc[:, 1],
                             loc[:, 0], loc[:, 1], active, 0.0, 0.0,
                             order, 8)
    if out is None:
        pytest.skip("native library unavailable")
    sq, pilots = out
    ref_sq, ref_pilots = _form_squads_numpy(
        loc, loc, active, loc[:, 0], loc[:, 1], loc[:, 0], loc[:, 1],
        0.0, 0.0, order, 8)
    np.testing.assert_array_equal(pilots, ref_pilots)
    np.testing.assert_array_equal(sq, ref_sq)
    assert len(pilots) == t  # strict < 0 window: all singletons
