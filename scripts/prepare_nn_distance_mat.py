"""Build the NxN depth-reprojection-overlap matrix consumed by kNN retrieval.

Reference scripts/prepare_nn_distance_mat.py:50-121: for each capture pair
(i, j), lift j's depth to a world point cloud, reproject into i, and score
the depth-consistent IoU (|depth_i - reproj_z| < 100 over the union of valid
masks). Incrementally resumable: the matrix starts at -1 and cells are filled
in chunks; multiprocessing replaces the reference's joblib.

Usage: python scripts/prepare_nn_distance_mat.py \
    --scene_dir ... --image_dir ... --depth_dir ... \
    --valid_list megadepth_valid_list.json --out dist_mat.npy
"""

import argparse
import os
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET_THRESHOLD = 100.0  # reference prepare_nn_distance_mat.py OFFSET

_scene = None


def distance_between_two_caps(cap_1, cap_2) -> float:
    """Depth-consistent reprojection IoU (reference :50-75)."""
    from cotr_tpu.geometry.projector import pcd_2d_to_img_2d, pcd_3d_to_pcd_2d

    try:
        pcd = cap_2.point_cloud_world
        size = cap_1.pinhole_cam.shape[:2]
        reproj = pcd_3d_to_pcd_2d(
            pcd[:, 0:3], cap_1.pinhole_cam.intrinsic_mat,
            cap_1.cam_pose.world_to_camera[0:3, :], size,
            keep_z=True, crop=True, filter_neg=True, norm_coord=False)
        reproj = pcd_2d_to_img_2d(reproj, size)[..., 0]
        query_mask = cap_1.depth_map > 0
        reproj_mask = reproj > 0
        inter = query_mask & reproj_mask
        union = query_mask | reproj_mask
        if union.sum() == 0:
            return 0.0
        inter = (np.abs(cap_1.depth_map - reproj) * inter
                 < OFFSET_THRESHOLD) & inter
        return float(inter.sum() / union.sum())
    except Exception as e:
        print(f"pair failed: {e}")
        return 0.0


def _work(pair):
    i, j = pair
    return i, j, distance_between_two_caps(_scene.captures[i],
                                           _scene.captures[j])


def _init(scene_args):
    global _scene
    from cotr_tpu.data.colmap import ColmapWithDepthAsciiReader

    _scene = ColmapWithDepthAsciiReader.read_sfm_scene_given_valid_list_path(
        *scene_args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--depth_dir", required=True)
    ap.add_argument("--valid_list", required=True)
    ap.add_argument("--out", default="dist_mat.npy")
    ap.add_argument("--num_cpus", type=int, default=os.cpu_count())
    ap.add_argument("--cells", type=int, default=10_000,
                    help="max cells per invocation (resumable)")
    args = ap.parse_args()

    scene_args = (args.scene_dir, args.image_dir, args.depth_dir,
                  args.valid_list, "no_crop")
    _init(scene_args)
    n = len(_scene.captures)

    if os.path.isfile(args.out):
        dist = np.load(args.out)
        assert dist.shape == (n, n)
        if dist.min() >= 0:
            print(f"{args.out} is complete")
            return
    else:
        dist = np.full((n, n), -1.0, np.float32)
    np.fill_diagonal(dist, 1.0)

    todo = np.argwhere(dist < 0)[:args.cells]
    print(f"{n}x{n} matrix; {len(todo)} cells this run; "
          f"{(dist >= 0).mean():.1%} done")
    with Pool(args.num_cpus, initializer=_init,
              initargs=(scene_args,)) as pool:
        for i, j, v in pool.imap_unordered(_work, [tuple(p) for p in todo],
                                           chunksize=16):
            dist[i, j] = v
    np.save(args.out, dist)
    print(f"progress {(dist >= 0).mean():.1%}; saved {args.out}")


if __name__ == "__main__":
    main()
