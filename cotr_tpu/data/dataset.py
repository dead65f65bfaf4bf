"""Correspondence supervision synthesis -> fixed-shape training batches.

Equivalent of reference COTR/datasets/cotr_dataset.py: lift every valid
neighbor depth pixel to 3D, project into the query camera, occlusion-check
(|z_proj - z_depth| < 0.5), resample to exactly num_kp correspondences,
random horizontal flip, normalize to canvas coordinates, bidirectional
doubling (cotr_dataset.py:60-122). The zoom variant crops both captures
around a seed correspondence at a log-spaced random scale with jitter
(cotr_dataset.py:194-243).

TPU-first differences: samples come out as plain numpy dicts with STATIC
shapes ({image: (256, 512, 3) normalized float32, queries/targets:
(2*num_kp, 2)}), and batching is a simple iterator suitable for feeding a
jitted train step — no torch DataLoader.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, Optional

import numpy as np

from cotr_tpu.data.megadepth import DataConfig, MegadepthDataset
from cotr_tpu.geometry import capture as capture_mod
from cotr_tpu.geometry.capture import CropCamConfig
from cotr_tpu.geometry.projector import pcd_2d_to_pcd_3d, pcd_3d_to_pcd_2d
from cotr_tpu.ops.canvas import normalize_canvas, two_images_side_by_side
from cotr_tpu.utils.constants import MAX_SIZE


def compute_corrs(from_cap, to_cap, reduced_size: Optional[int] = None,
                  rng: Optional[np.random.RandomState] = None
                  ) -> Optional[np.ndarray]:
    """Depth-consistent correspondences from from_cap to to_cap
    (cotr_dataset.py:138-167 / 68-97): (N, 4) [x_from, y_from, x_to, y_to]
    or None when no pixel survives the occlusion check.

    Uses the C++ inner loop (cotr_tpu.native.synth_corrs) when available and
    no subsampling is requested; falls back to vectorized numpy."""
    if reduced_size is None:
        from cotr_tpu import native

        if native.available():
            out = native.synth_corrs(
                from_cap.depth_map,
                np.linalg.inv(from_cap.pinhole_cam.intrinsic_mat),
                from_cap.cam_pose.camera_to_world,
                to_cap.pinhole_cam.intrinsic_mat @
                to_cap.cam_pose.world_to_camera[0:3, :],
                to_cap.depth_map)
            if out is not None:
                return out.astype(np.float64) if out.shape[0] else None
    ys, xs = np.where(from_cap.depth_map > 0)
    ys, xs = ys[..., None], xs[..., None]
    if reduced_size is not None and ys.shape[0] > 0:
        rng = rng or np.random
        take = min(reduced_size, ys.shape[0])
        sel = rng.choice(ys.shape[0], take, replace=False)
        ys, xs = ys[sel], xs[sel]
    if ys.shape[0] == 0:
        return None
    zs = from_cap.depth_map[ys[:, 0], xs[:, 0]][..., None]
    from_xy = np.concatenate([xs, ys], axis=1)
    world, idx1 = pcd_2d_to_pcd_3d(from_xy, zs,
                                   from_cap.pinhole_cam.intrinsic_mat,
                                   motion=from_cap.cam_pose.camera_to_world,
                                   return_index=True)
    to_xyz, idx2 = pcd_3d_to_pcd_2d(
        world, to_cap.pinhole_cam.intrinsic_mat,
        to_cap.cam_pose.world_to_camera[0:3, :], to_cap.image.shape[:2],
        keep_z=True, crop=True, filter_neg=True, norm_coord=False,
        return_index=True)
    to_xy = to_xyz[:, 0:2]
    z_proj = to_xyz[:, 2:3]
    z_depth = to_cap.depth_map[
        np.floor(to_xy[:, 1:2]).astype(int)[:, 0],
        np.floor(to_xy[:, 0:1]).astype(int)[:, 0]][..., None]
    mask = (np.abs(z_depth - z_proj) < 0.5)[:, 0]
    if mask.sum() == 0:
        return None
    return np.concatenate([from_xy[idx1][idx2][mask], to_xy[mask]], axis=1)


def _trim_corrs(corrs: np.ndarray, num_kp: int,
                rng: np.random.RandomState) -> np.ndarray:
    """Resample-with-replacement to exactly num_kp (cotr_dataset.py:36-43)."""
    n = corrs.shape[0]
    if n >= num_kp:
        return corrs[rng.choice(n, num_kp)]
    extra = corrs[rng.choice(n, num_kp - n)]
    return np.concatenate([corrs, extra], axis=0)


def _package(query_img: np.ndarray, nn_img: np.ndarray, corrs: np.ndarray,
             bidirectional: bool, rng: np.random.RandomState,
             raw_uint8: bool = False) -> Dict[str, np.ndarray]:
    """Flip augmentation + canvas normalization + bidirectional doubling
    (cotr_dataset.py:99-122).

    With ``raw_uint8`` the canvas stays uint8 and normalization happens on
    device inside the train step (4x less host->device traffic)."""
    corrs = corrs.astype(np.float64).copy()
    if rng.uniform() < 0.5:
        corrs[:, 0] = MAX_SIZE - 1 - corrs[:, 0]
        corrs[:, 2] = MAX_SIZE - 1 - corrs[:, 2]
        sbs = two_images_side_by_side(np.fliplr(query_img), np.fliplr(nn_img))
    else:
        sbs = two_images_side_by_side(query_img, nn_img)
    corrs[:, 2] += MAX_SIZE
    corrs /= np.array([MAX_SIZE * 2, MAX_SIZE, MAX_SIZE * 2, MAX_SIZE])
    assert (0.0 <= corrs[:, 0]).all() and (corrs[:, 0] <= 0.5).all()
    assert (0.0 <= corrs[:, 1]).all() and (corrs[:, 1] <= 1.0).all()
    assert (0.5 <= corrs[:, 2]).all() and (corrs[:, 2] <= 1.0).all()
    assert (0.0 <= corrs[:, 3]).all() and (corrs[:, 3] <= 1.0).all()
    sbs = np.ascontiguousarray(sbs)
    out = {
        "image": (sbs.astype(np.uint8) if raw_uint8
                  else normalize_canvas(sbs)),
        "corrs": corrs.astype(np.float32),
    }
    if bidirectional:
        out["queries"] = np.concatenate([corrs[:, :2], corrs[:, 2:]],
                                        axis=0).astype(np.float32)
        out["targets"] = np.concatenate([corrs[:, 2:], corrs[:, :2]],
                                        axis=0).astype(np.float32)
    else:
        out["queries"] = corrs[:, :2].astype(np.float32)
        out["targets"] = corrs[:, 2:].astype(np.float32)
    return out


class CotrDataset:
    """Stage 1/2 dataset: captures pre-cropped to 256-square by crop_cam
    ('crop_center_and_resize'); correspondences from full-frame depth
    reprojection (cotr_dataset.py:21-122)."""

    def __init__(self, cfg: DataConfig, dataset_type: str, seed: int = 0,
                 device_synth: bool = False, cand_factor: int = 6):
        self.cfg = cfg
        self.dataset_type = dataset_type
        self.sfm = MegadepthDataset(cfg, dataset_type,
                                    rng=random.Random(seed))
        self.rng = np.random.RandomState(seed)
        self._py_rng = random.Random(seed + 1)
        # device_synth: emit the data.device_synth layout — candidate depth
        # pixels + camera matrices + quantized query depth — and synthesize
        # correspondences INSIDE the jitted train step (the loader-bound
        # escape hatch measured in PERF.md §4; host work per sample drops to
        # crops + an np.where + gathers)
        self.device_synth = device_synth
        self.cand_factor = cand_factor

    def __len__(self):
        if self.dataset_type == "val":
            return min(1000, self.sfm.num_queries)
        return self.sfm.num_queries

    def _augment_rotation(self, query_cap, nn_cap):
        cfg = self.cfg
        if cfg.need_rotation:
            if self._py_rng.random() < cfg.rotation_chance:
                theta = self.rng.uniform(-1, 1) * cfg.max_rotation
                query_cap = capture_mod.rotate_capture(query_cap, theta)
            if self._py_rng.random() < cfg.rotation_chance:
                theta = self.rng.uniform(-1, 1) * cfg.max_rotation
                nn_cap = capture_mod.rotate_capture(nn_cap, theta)
        return query_cap, nn_cap

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        for _attempt in range(64):
            query_cap, nn_caps = self.sfm.get_query_with_knn(index)
            nn_cap = nn_caps[0]
            query_cap, nn_cap = self._augment_rotation(query_cap, nn_cap)
            if self.device_synth:
                # cheap host-side viability check only (the real validity —
                # projection + occlusion — happens on device; samples with
                # few valid picks contribute proportionally via weights)
                if (np.count_nonzero(nn_cap.depth_map) < self.cfg.num_kp
                        or np.count_nonzero(query_cap.depth_map) == 0):
                    index = self.rng.randint(0, len(self))
                    continue
                from cotr_tpu.data.device_synth import emit_device_sample

                return emit_device_sample(query_cap, nn_cap,
                                          self.cfg.num_kp, self.rng,
                                          cand_factor=self.cand_factor)
            corrs = compute_corrs(nn_cap, query_cap)
            # corrs: nn -> query; package as (query, nn) ordering like the
            # reference (query keypoints first, cotr_dataset.py:95-97)
            if corrs is not None and corrs.shape[0] >= self.cfg.num_kp:
                corrs = np.concatenate([corrs[:, 2:], corrs[:, :2]], axis=1)
                corrs = _trim_corrs(corrs, self.cfg.num_kp, self.rng)
                return _package(query_cap.image, nn_cap.image, corrs,
                                self.cfg.bidirectional, self.rng)
            index = self.rng.randint(0, len(self))
        raise RuntimeError("could not synthesize a sample after 64 attempts")


class CotrZoomDataset(CotrDataset):
    """Stage 3 zoom dataset (cotr_dataset.py:125-243): crop both captures
    around a seed correspondence at a random log-spaced scale with query-side
    jitter, recompute correspondences inside the crops."""

    def __init__(self, cfg: DataConfig, dataset_type: str, seed: int = 0):
        assert cfg.crop_cam in ("no_crop", "crop_center")
        assert not cfg.use_ram
        super().__init__(cfg, dataset_type, seed)
        self.zooms = np.logspace(np.log10(cfg.zoom_start),
                                 np.log10(cfg.zoom_end),
                                 num=cfg.zoom_levels)

    def _get_zoomed_cap(self, cap, pos, scale, jitter):
        from cotr_tpu.inference.dense import to_square_patches  # noqa: F401
        from cotr_tpu.inference.refine import patch_box  # noqa: F401
        # host-side patch math (inference_helper.py:78-102 semantics)
        from cotr_tpu.inference.grouped import patch_box_np

        h, w = cap.image.shape[:2]
        x0, y0, size = patch_box_np(np.asarray(pos, np.float64)[None],
                                    scale, h, w)
        jit = np.array([size, size]) * self.rng.uniform(-jitter, jitter, 2)
        x0, y0, size = patch_box_np(
            (np.asarray(pos, np.float64) + jit)[None], scale, h, w)
        cfg = CropCamConfig(x=int(x0[0]), y=int(y0[0]), w=int(size),
                            h=int(size), out_w=MAX_SIZE, out_h=MAX_SIZE,
                            orig_w=w, orig_h=h)
        return capture_mod.crop_capture(cap, cfg)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        for _attempt in range(64):
            query_cap, nn_caps = self.sfm.get_query_with_knn(index)
            nn_cap = nn_caps[0]
            query_cap, nn_cap = self._augment_rotation(query_cap, nn_cap)

            seed_corrs = compute_corrs(nn_cap, query_cap, reduced_size=100,
                                       rng=self.rng)
            if seed_corrs is None:
                index = self.rng.randint(0, len(self))
                continue
            seed = seed_corrs[self.rng.permutation(len(seed_corrs))[0]]

            s = self.rng.choice(self.zooms)
            nn_zoom = self._get_zoomed_cap(nn_cap, seed[:2], s, 0)
            query_zoom = self._get_zoomed_cap(query_cap, seed[2:], s,
                                              self.cfg.zoom_jitter)
            corrs = compute_corrs(query_zoom, nn_zoom)
            if corrs is None or corrs.shape[0] < self.cfg.num_kp:
                index = self.rng.randint(0, len(self))
                continue
            corrs = corrs[self.rng.permutation(corrs.shape[0])]
            corrs = _trim_corrs(corrs, self.cfg.num_kp, self.rng)
            return _package(query_zoom.image, nn_zoom.image, corrs,
                            self.cfg.bidirectional, self.rng)
        raise RuntimeError("could not synthesize a zoom sample")


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True
                   ) -> Iterator[Dict[str, np.ndarray]]:
    """Stack dataset samples into fixed-shape batches for the jitted train
    step (replaces the reference's torch DataLoader, train_cotr.py:42-47)."""
    order = np.arange(len(dataset))
    rng = np.random.RandomState(seed)
    if shuffle:
        rng.shuffle(order)
    batch = []
    for idx in order:
        batch.append(dataset[int(idx)])
        if len(batch) == batch_size:
            yield {k: np.stack([s[k] for s in batch]) for k in batch[0]}
            batch = []
    if batch and not drop_last:
        yield {k: np.stack([s[k] for s in batch]) for k in batch[0]}
