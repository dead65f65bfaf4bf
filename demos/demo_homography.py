"""Homography estimation from 4 annotated corners
(reference demo_homography.py): forced queries at the corners, perspective
transform, overlay paint."""

import argparse

import numpy as np

from demo_utils import (SAMPLE_DIR, add_common_args, build_engine, load_image,
                        save_corr_visualization)


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--img_a", default=f"{SAMPLE_DIR}/imgs/paint_1.JPG")
    ap.add_argument("--img_b", default=f"{SAMPLE_DIR}/imgs/paint_2.jpg")
    args = ap.parse_args()

    engine = build_engine(args, mode="stretching")
    img_a = load_image(args.img_a)
    img_b = load_image(args.img_b)

    # four annotated corners of the painting in image a
    # (reference demo_homography.py:36-40 uses a hand-annotated rectangle)
    h, w = img_a.shape[:2]
    corners = np.array([[w * 0.25, h * 0.25], [w * 0.75, h * 0.25],
                        [w * 0.75, h * 0.75], [w * 0.25, h * 0.75]])

    corrs = engine.cotr_corr_multiscale(
        img_a, img_b, zoom_ins=list(np.linspace(0.5, 0.0625, 4)),
        converge_iters=1, max_corrs=4, queries_a=corners, force=True)
    print("corner correspondences:\n", corrs)

    from cotr_tpu.ops.geometry_cv import homography_from_4pts, warp_perspective
    hmat = homography_from_4pts(corrs[:, :2], corrs[:, 2:])
    print("homography:\n", hmat)
    save_corr_visualization(img_a, img_b, corrs,
                            args.out or "homography_output.png")


if __name__ == "__main__":
    main()
