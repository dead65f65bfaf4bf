"""Geometry core: quaternion algebra, pose roundtrips, projection."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from cotr_tpu.geometry import transforms
from cotr_tpu.geometry.camera import (CameraPose, PinholeCamera, Rotation,
                                      Translation, crop_pinhole_camera,
                                      rotate_camera_pose)
from cotr_tpu.geometry.capture import CropCamConfig, crop_center_max, pad_to_square
from cotr_tpu.geometry.projector import (pcd_2d_to_img_2d, pcd_2d_to_pcd_3d,
                                         pcd_3d_to_pcd_2d)


def random_rotation_matrix(rng):
    m = np.identity(4)
    m[:3, :3] = ScipyRot.random(random_state=rng).as_matrix()
    return m


def test_quaternion_matrix_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(25):
        m = random_rotation_matrix(rng)
        q = transforms.quaternion_from_matrix(m)
        m2 = transforms.quaternion_matrix(q)
        np.testing.assert_allclose(m2, m, atol=1e-9)


def test_quaternion_vs_scipy():
    rng = np.random.RandomState(1)
    for _ in range(25):
        r = ScipyRot.random(random_state=rng)
        m = np.identity(4)
        m[:3, :3] = r.as_matrix()
        q_ours = transforms.quaternion_from_matrix(m)  # (w, x, y, z)
        q_scipy = r.as_quat()  # (x, y, z, w)
        q_scipy = np.array([q_scipy[3], *q_scipy[:3]])
        if q_scipy[0] < 0:
            q_scipy = -q_scipy
        np.testing.assert_allclose(q_ours, q_scipy, atol=1e-9)


def test_quaternion_inverse():
    rng = np.random.RandomState(2)
    q = transforms.quaternion_from_matrix(random_rotation_matrix(rng))
    qi = transforms.quaternion_inverse(q)
    prod = transforms.quaternion_multiply(q, qi)
    np.testing.assert_allclose(prod, [1, 0, 0, 0], atol=1e-12)


def test_camera_pose_roundtrip():
    rng = np.random.RandomState(3)
    w2c = random_rotation_matrix(rng)
    w2c[:3, 3] = rng.uniform(-5, 5, 3)
    pose = CameraPose.from_world_to_camera(w2c)
    np.testing.assert_allclose(pose.world_to_camera, w2c, atol=1e-5)
    np.testing.assert_allclose(pose.camera_to_world @ w2c, np.eye(4),
                               atol=1e-5)


def test_rotate_camera_pose_roll():
    rng = np.random.RandomState(4)
    w2c = random_rotation_matrix(rng)
    pose = CameraPose.from_world_to_camera(w2c)
    r360 = rotate_camera_pose(pose, 360.0)
    np.testing.assert_allclose(r360.world_to_camera, pose.world_to_camera,
                               atol=1e-5)


def test_projection_roundtrip():
    """3D -> 2D -> 3D with known depth recovers the points."""
    rng = np.random.RandomState(5)
    cam = PinholeCamera(640, 480, 500.0, 500.0, 320.0, 240.0)
    pts = rng.uniform(-1, 1, (200, 3))
    pts[:, 2] = rng.uniform(2, 5, 200)  # in front of the camera
    extrinsic = np.eye(4)[:3]
    img_pts, idx = pcd_3d_to_pcd_2d(pts, cam.intrinsic_mat, extrinsic,
                                    (480, 640), keep_z=True, crop=True,
                                    filter_neg=True, norm_coord=False,
                                    return_index=True)
    assert img_pts.shape[1] == 3
    back = pcd_2d_to_pcd_3d(img_pts[:, :2], img_pts[:, 2:3],
                            cam.intrinsic_mat)
    np.testing.assert_allclose(back, pts[idx], atol=1e-9)


def test_projection_occlusion_filters():
    cam = PinholeCamera(64, 64, 64.0, 64.0, 32.0, 32.0)
    pts = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, -2.0], [100.0, 0.0, 1.0]])
    out, idx = pcd_3d_to_pcd_2d(pts, cam.intrinsic_mat, np.eye(4)[:3],
                                (64, 64), keep_z=False, return_index=True)
    # behind-camera filtered; out-of-frame cropped
    assert list(idx) == [0]


def test_splat_z_order():
    """Nearer points must win the splat (pcd_2d_to_img_2d z ordering)."""
    pcd = np.array([[5.0, 5.0, 2.0, 10.0],
                    [5.0, 5.0, 1.0, 20.0]])  # same pixel, z=2 then z=1
    img = pcd_2d_to_img_2d(pcd, (8, 8), has_z=True, keep_z=False)
    assert img[5, 5, 0] == 20.0  # nearest point's payload


def test_crop_pinhole_camera_modes():
    cam = PinholeCamera(640, 480, 500.0, 600.0, 320.0, 240.0)
    cc = crop_pinhole_camera(cam, "crop_center")
    assert cc.shape == (480, 480)
    ccr = crop_pinhole_camera(cam, "crop_center_and_resize")
    assert ccr.shape == (256, 256)
    assert abs(ccr.fx - 500.0 * 256 / 480) < 1e-9
    cfg = CropCamConfig(x=10, y=20, w=100, h=100, out_w=256, out_h=256,
                        orig_w=640, orig_h=480)
    ccfg = crop_pinhole_camera(cam, cfg)
    assert ccfg.shape == (256, 256)
    assert abs(ccfg.cx - (320.0 - 10) * 2.56) < 1e-9


def test_crop_center_max_and_pad():
    img = np.arange(6 * 8 * 3).reshape(6, 8, 3)
    c = crop_center_max(img)
    assert c.shape == (6, 6, 3)
    p = pad_to_square(img)
    assert p.shape == (8, 8, 3)
