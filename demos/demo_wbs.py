"""Wide-baseline stereo with known relative scale (reference demo_wbs.py):
pass areas=[1.0, 1.0] to skip the dense scale-estimation pass entirely."""

import argparse

import numpy as np

from demo_utils import (SAMPLE_DIR, add_common_args, build_engine, load_image,
                        save_corr_visualization)


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--img_a", default=f"{SAMPLE_DIR}/imgs/petrzin_01.png")
    ap.add_argument("--img_b", default=f"{SAMPLE_DIR}/imgs/petrzin_02.png")
    ap.add_argument("--pts", default=f"{SAMPLE_DIR}/petrzin_pts.txt")
    args = ap.parse_args()

    engine = build_engine(args, mode="tile")
    img_a = load_image(args.img_a)
    img_b = load_image(args.img_b)
    gt = np.loadtxt(args.pts)
    queries = gt[:, :2]

    corrs = engine.cotr_corr_multiscale(
        img_a, img_b, zoom_ins=list(np.linspace(0.5, 0.0625, 4)),
        converge_iters=1, max_corrs=len(queries), queries_a=queries,
        force=True, areas=[1.0, 1.0])
    err = np.linalg.norm(corrs[:, 2:] - gt[:, 2:], axis=1)
    print(f"{corrs.shape[0]} correspondences; "
          f"mean error vs annotation: {err.mean():.2f}px, "
          f"median {np.median(err):.2f}px")
    save_corr_visualization(img_a, img_b, corrs, args.out or "wbs_output.png")


if __name__ == "__main__":
    main()
