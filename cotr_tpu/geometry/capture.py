"""Lazy-IO capture objects + crop algebra.

Equivalent of reference COTR/cameras/capture.py: images/depths are loaded
from disk on property access, run through rotation then a crop_cam pipeline
('no_crop' | 'crop_center' | 'crop_center_and_resize' | CropCamConfig), and
the paired pinhole camera intrinsics are rewritten to match (capture.py
:172-297, :301-432). Depth uses NEAREST resampling, images BILINEAR, like the
reference. HDF5 depth is read with h5py (reference uses PyTables,
capture.py:254-257); COLMAP .geometric.bin via read_colmap_array.
"""

from __future__ import annotations

import copy
import os
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import numpy as np
import PIL.Image

from cotr_tpu.geometry.camera import (CameraPose, PinholeCamera,
                                      crop_pinhole_camera, rotate_camera_pose)
from cotr_tpu.geometry.projector import img_2d_to_pcd_3d
from cotr_tpu.utils.constants import MAX_SIZE


@dataclass
class CropCamConfig:
    """Crop window (x, y upper-left; w, h) resized to (out_w, out_h)
    (reference utils/utils.py:29-54)."""

    x: int
    y: int
    w: int
    h: int
    out_w: int
    out_h: int
    orig_w: int
    orig_h: int


CropCam = Union[str, CropCamConfig]


def crop_center_max(img: np.ndarray) -> np.ndarray:
    """Center square crop of side min(h, w) (capture.py:67-90)."""
    h, w = img.shape[:2]
    size = min(h, w)
    sx = w // 2 - size // 2
    sy = h // 2 - size // 2
    return img[sy:sy + size, sx:sx + size]


def pad_to_square(img: np.ndarray, till_divisible_by: int = 1,
                  return_starts: bool = False):
    """Zero-pad to a centered square (capture.py:93-120)."""
    h, w = img.shape[:2]
    if till_divisible_by == 1:
        size = max(h, w)
    else:
        size = (max(h, w) + till_divisible_by) - (max(h, w) % till_divisible_by)
    sx = size // 2 - w // 2
    sy = size // 2 - h // 2
    canvas = np.zeros((size, size) + img.shape[2:], dtype=img.dtype)
    canvas[sy:sy + h, sx:sx + w] = img
    if return_starts:
        return canvas, sx, sy
    return canvas


def rotate_image(image: np.ndarray, angle_deg: float,
                 nearest: bool = False) -> np.ndarray:
    """Rotate about the image center keeping the frame size
    (capture.py:128-132). cv2-free: PIL rotate matches warpAffine here."""
    resample = PIL.Image.NEAREST if nearest else PIL.Image.BILINEAR
    pil = PIL.Image.fromarray(image)
    return np.array(pil.rotate(angle_deg, resample=resample, expand=False))


def read_colmap_array(path: str) -> np.ndarray:
    """COLMAP dense .bin (geometric depth) reader (capture.py:135-153)."""
    with open(path, "rb") as fid:
        header = fid.readline().decode("utf-8")
        # header format: width&height&channels& followed by data
        parts = header.split("&")
        width, height, channels = int(parts[0]), int(parts[1]), int(parts[2])
        # rewind: data begins right after the third '&'
        fid.seek(0)
        num_delim = 0
        while num_delim < 3:
            if fid.read(1) == b"&":
                num_delim += 1
        array = np.fromfile(fid, np.float32)
    array = array.reshape((width, height, channels), order="F")
    return np.transpose(array, (1, 0, 2)).squeeze()


def _resize_pil(arr: np.ndarray, shape_hw: Tuple[int, int],
                nearest: bool = False) -> np.ndarray:
    resample = PIL.Image.NEAREST if nearest else PIL.Image.BILINEAR
    return np.array(PIL.Image.fromarray(arr).resize(shape_hw[::-1],
                                                    resample=resample))


def _apply_crop_cam(arr: np.ndarray, crop_cam: CropCam,
                    nearest: bool) -> np.ndarray:
    if crop_cam == "no_crop":
        return arr
    if crop_cam == "crop_center":
        return crop_center_max(arr)
    if crop_cam == "crop_center_and_resize":
        return _resize_pil(crop_center_max(arr), (MAX_SIZE, MAX_SIZE), nearest)
    if isinstance(crop_cam, CropCamConfig):
        c = crop_cam
        assert arr.shape[0] == c.orig_h and arr.shape[1] == c.orig_w
        cropped = arr[c.y:c.y + c.h, c.x:c.x + c.w]
        return _resize_pil(cropped, (c.out_h, c.out_w), nearest)
    raise ValueError(f"unknown crop_cam: {crop_cam}")


class CapturedImage:
    """Lazy image: path + rotation + crop pipeline applied at access
    (capture.py:172-236)."""

    def __init__(self, img_path: str, crop_cam: CropCam,
                 pinhole_cam_before: Optional[PinholeCamera] = None):
        assert os.path.isfile(img_path), f"file does not exist: {img_path}"
        self.img_path = img_path
        self.crop_cam = crop_cam
        self.pinhole_cam_before = pinhole_cam_before
        self.rotation = 0.0
        self._image: Optional[np.ndarray] = None

    def read_image_to_ram(self) -> int:
        assert self._image is None
        self._image = self.image
        return self._image.nbytes

    @property
    def image(self) -> np.ndarray:
        if self._image is not None:
            return self._image
        import imageio.v2 as imageio

        img = imageio.imread(self.img_path, pilmode="RGB")
        if self.rotation != 0:
            img = rotate_image(img, self.rotation)
        if (self.pinhole_cam_before is not None and
                img.shape[:2] != self.pinhole_cam_before.shape):
            img = _resize_pil(img, self.pinhole_cam_before.shape)
        return _apply_crop_cam(img, self.crop_cam, nearest=False)


class CapturedDepth:
    """Lazy depth: .h5 (MegaDepth), COLMAP .bin, or '<img>dummy' zero depth
    (capture.py:239-297)."""

    def __init__(self, depth_path: str, crop_cam: CropCam,
                 pinhole_cam_before: Optional[PinholeCamera] = None):
        if not depth_path.endswith("dummy"):
            assert os.path.isfile(depth_path), (
                f"file does not exist: {depth_path}")
        self.depth_path = depth_path
        self.crop_cam = crop_cam
        self.pinhole_cam_before = pinhole_cam_before
        self.rotation = 0.0
        self._depth: Optional[np.ndarray] = None

    def _read(self) -> np.ndarray:
        if self.depth_path.endswith("dummy"):
            w, h = PIL.Image.open(self.depth_path[:-5]).size
            return np.zeros([h, w], np.float32)
        if self.depth_path.endswith(".h5"):
            import h5py

            with h5py.File(self.depth_path, "r") as f:
                return np.asarray(f["depth"]).astype(np.float32)
        if self.depth_path.endswith(".bin"):
            return read_colmap_array(self.depth_path).astype(np.float32)
        raise ValueError(f"unsupported depth format: {self.depth_path}")

    def read_depth_to_ram(self) -> int:
        assert self._depth is None
        self._depth = self.depth_map
        return self._depth.nbytes

    @property
    def depth_map(self) -> np.ndarray:
        if self._depth is not None:
            return self._depth
        depth = self._read()
        if self.rotation != 0:
            depth = rotate_image(depth, self.rotation, nearest=True)
        if (self.pinhole_cam_before is not None and
                depth.shape != self.pinhole_cam_before.shape):
            depth = _resize_pil(depth, self.pinhole_cam_before.shape,
                                nearest=True)
        depth = _apply_crop_cam(depth, self.crop_cam, nearest=True)
        assert (depth >= 0).all()
        return depth


class BasePinholeCapture:
    """camera + pose + crop config (capture.py:301-334)."""

    def __init__(self, pinhole_cam: PinholeCamera, cam_pose: CameraPose,
                 crop_cam: CropCam):
        self.crop_cam = crop_cam
        self.cam_pose = cam_pose
        self.pinhole_cam = crop_pinhole_camera(pinhole_cam, crop_cam)
        self.pinhole_cam_before = pinhole_cam

    @property
    def intrinsic_mat(self):
        return self.pinhole_cam.intrinsic_mat

    @property
    def extrinsic_mat(self):
        return self.cam_pose.extrinsic_mat

    @property
    def shape(self):
        return self.pinhole_cam.shape

    size = shape

    @property
    def mvp_mat(self):
        return np.matmul(self.pinhole_cam.intrinsic_mat,
                         self.cam_pose.world_to_camera_3x4)


class RGBPinholeCapture(BasePinholeCapture):
    def __init__(self, img_path, pinhole_cam, cam_pose, crop_cam):
        # explicit base call: RGBDPinholeCapture diamond-inherits this class
        # and DepthPinholeCapture, so super() would hit the sibling
        BasePinholeCapture.__init__(self, pinhole_cam, cam_pose, crop_cam)
        self.captured_image = CapturedImage(img_path, crop_cam,
                                            self.pinhole_cam_before)

    def read_image_to_ram(self) -> int:
        return self.captured_image.read_image_to_ram()

    @property
    def img_path(self):
        return self.captured_image.img_path

    @property
    def image(self):
        img = self.captured_image.image
        assert img.shape[0:2] == self.pinhole_cam.shape
        return img

    @property
    def seq_id(self):
        return os.path.dirname(self.captured_image.img_path)


class DepthPinholeCapture(BasePinholeCapture):
    def __init__(self, depth_path, pinhole_cam, cam_pose, crop_cam):
        BasePinholeCapture.__init__(self, pinhole_cam, cam_pose, crop_cam)
        self.captured_depth = CapturedDepth(depth_path, crop_cam,
                                            self.pinhole_cam_before)

    def read_depth_to_ram(self) -> int:
        return self.captured_depth.read_depth_to_ram()

    @property
    def depth_path(self):
        return self.captured_depth.depth_path

    @property
    def depth_map(self):
        depth = self.captured_depth.depth_map
        assert (depth >= 0).all()
        return depth

    @property
    def point_cloud_world(self):
        return self.get_point_cloud_world_from_depth(None)

    def get_point_cloud_world_from_depth(self, feat_map=None):
        return img_2d_to_pcd_3d(self.depth_map, self.pinhole_cam.intrinsic_mat,
                                img=feat_map,
                                motion=self.cam_pose.camera_to_world)


class RGBDPinholeCapture(RGBPinholeCapture, DepthPinholeCapture):
    def __init__(self, img_path, depth_path, pinhole_cam, cam_pose, crop_cam):
        RGBPinholeCapture.__init__(self, img_path, pinhole_cam, cam_pose,
                                   crop_cam)
        DepthPinholeCapture.__init__(self, depth_path, pinhole_cam, cam_pose,
                                     crop_cam)

    @property
    def point_cloud_w_rgb_world(self):
        return self.get_point_cloud_world_from_depth(self.image)


def rotate_capture(cap, rot_deg: float):
    """Functional rotation (capture.py:407-419)."""
    if rot_deg == 0:
        return copy.deepcopy(cap)
    out = copy.deepcopy(cap)
    out.cam_pose = rotate_camera_pose(cap.cam_pose, rot_deg)
    if hasattr(out, "captured_image"):
        out.captured_image.rotation = rot_deg
    if hasattr(out, "captured_depth"):
        out.captured_depth.rotation = rot_deg
    return out


def crop_capture(cap, crop_cam: CropCam):
    """Functional crop: re-derives the capture with a new crop config applied
    on top of the current camera (capture.py:421-432)."""
    if isinstance(cap, RGBDPinholeCapture):
        out = RGBDPinholeCapture(cap.img_path, cap.depth_path,
                                 cap.pinhole_cam, cap.cam_pose, crop_cam)
    elif isinstance(cap, RGBPinholeCapture):
        out = RGBPinholeCapture(cap.img_path, cap.pinhole_cam, cap.cam_pose,
                                crop_cam)
    else:
        raise ValueError(f"cannot crop {type(cap)}")
    if hasattr(out, "captured_image"):
        out.captured_image.rotation = cap.captured_image.rotation
    if hasattr(out, "captured_depth"):
        out.captured_depth.rotation = cap.captured_depth.rotation
    return out
