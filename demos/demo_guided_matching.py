"""Guided matching over DISK keypoints (reference demo_guided_matching.py):
correspond keypoints both directions, mutual-NN match, RANSAC fundamental
pruning — RANSAC hypotheses solved in one vmapped device pass."""

import argparse
import time

import numpy as np

from demo_utils import (SAMPLE_DIR, add_common_args, build_engine, load_image,
                        save_corr_visualization)


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--img_a",
                    default=f"{SAMPLE_DIR}/imgs/21126421_4537535153.jpg")
    ap.add_argument("--img_b",
                    default=f"{SAMPLE_DIR}/imgs/21526113_4379776807.jpg")
    ap.add_argument("--kpts_a", default=f"{SAMPLE_DIR}/"
                    "21126421_4537535153.jpg.disk.kpts.npy")
    ap.add_argument("--kpts_b", default=f"{SAMPLE_DIR}/"
                    "21526113_4379776807.jpg.disk.kpts.npy")
    args = ap.parse_args()

    engine = build_engine(args, mode="tile")
    img_a = load_image(args.img_a)
    img_b = load_image(args.img_b)
    kpts_a = np.load(args.kpts_a)
    kpts_b = np.load(args.kpts_b)
    print(f"keypoints: {len(kpts_a)} / {len(kpts_b)}")

    t0 = time.time()
    zooms = list(np.linspace(0.5, 0.0625, 4))
    if hasattr(engine, "cotr_corr_multiscale_multipair"):
        # both directions are independent fixed-keypoint jobs: one multipair
        # call shares every dense-pass and squad dispatch between them
        (corr_ab, idx_ab), (corr_ba, idx_ba) = \
            engine.cotr_corr_multiscale_multipair(
                [(img_a, img_b), (img_b, img_a)], zoom_ins=zooms,
                max_corrs=[len(kpts_a), len(kpts_b)],
                queries_list=[kpts_a, kpts_b], force=True, return_idx=True)
    else:
        corr_ab, idx_ab = engine.cotr_corr_multiscale(
            img_a, img_b, zoom_ins=zooms, max_corrs=len(kpts_a),
            queries_a=kpts_a, force=True, return_idx=True)
        corr_ba, idx_ba = engine.cotr_corr_multiscale(
            img_b, img_a, zoom_ins=zooms, max_corrs=len(kpts_b),
            queries_a=kpts_b, force=True, return_idx=True)
    print(f"correspondence passes: {time.time() - t0:.1f}s "
          f"({engine.total_tasks} task-steps)")

    # mutual nearest neighbors through distance matrices
    # (demo_guided_matching.py:50-60)
    d_ab = np.linalg.norm(corr_ab[:, None, 2:] - kpts_b[None, :, :2], axis=2)
    d_ba = np.linalg.norm(corr_ba[:, None, 2:] - kpts_a[None, :, :2], axis=2)
    nn_ab = d_ab.argmin(axis=1)
    nn_ba = d_ba.argmin(axis=1)
    matches = []
    for i, j in enumerate(nn_ab):
        if nn_ba[j] == i:
            matches.append([*kpts_a[idx_ab[i]][:2], *kpts_b[j][:2]])
    matches = np.asarray(matches)
    print(f"mutual matches: {len(matches)}")

    if len(matches) >= 8:
        from cotr_tpu.ops.geometry_cv import find_fundamental_ransac
        f, mask = find_fundamental_ransac(matches[:, :2], matches[:, 2:],
                                          threshold=1.0)
        matches = matches[mask]
        print(f"RANSAC inliers: {len(matches)}")
    save_corr_visualization(img_a, img_b, matches,
                            args.out or "guided_matching_output.png")


if __name__ == "__main__":
    main()
