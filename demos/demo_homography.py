"""Virtual-painting overlay via homography (reference demo_homography.py):
the reference's 4 hand-annotated corners of the painting in frame A are
matched into frame B with forced queries; the replacement painting is then
perspective-warped onto frame B (demo_homography.py:36-49) and the composite
is written out (the reference's plt.show 4-panel, saved to disk here)."""

import argparse

import numpy as np

from demo_utils import (SAMPLE_DIR, add_common_args, build_engine, load_image,
                        save_corr_visualization)

# hand-annotated painting corners in paint_1.JPG
# (reference demo_homography.py:36-40: lu, ru, lb, rb)
ANNOTATED_CORNERS = np.array([[932, 1025], [2469, 901],
                              [908, 2927], [2436, 3080]], np.float32)


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--img_a", default=f"{SAMPLE_DIR}/imgs/paint_1.JPG")
    ap.add_argument("--img_b", default=f"{SAMPLE_DIR}/imgs/paint_2.jpg")
    ap.add_argument("--rep_img",
                    default=f"{SAMPLE_DIR}/imgs/Meisje_met_de_parel.jpg",
                    help="painting to composite over the matched corners")
    args = ap.parse_args()

    engine = build_engine(args, mode="stretching")
    img_a = load_image(args.img_a)
    img_b = load_image(args.img_b)
    rep_img = load_image(args.rep_img)

    corrs = engine.cotr_corr_multiscale(
        img_a, img_b, zoom_ins=list(np.linspace(0.5, 0.0625, 4)),
        converge_iters=1, max_corrs=4, queries_a=ANNOTATED_CORNERS.copy(),
        force=True)
    print("corner correspondences:\n", corrs)

    from cotr_tpu.ops.geometry_cv import homography_from_4pts, warp_perspective

    # replacement image corners -> matched corners in frame B
    # (reference demo_homography.py:41-49)
    rh, rw = rep_img.shape[:2]
    rep_coord = np.array([[0, 0], [rw, 0], [0, rh], [rw, rh]], np.float32)
    hmat = homography_from_4pts(rep_coord, corrs[:, 2:].astype(np.float32))
    print("homography:\n", hmat)

    out_hw = img_b.shape[:2]
    warped = warp_perspective(rep_img, hmat, out_hw)
    vmask = warp_perspective(np.ones(rep_img.shape[:2] + (1,), np.float32),
                             hmat, out_hw) > 0
    overlay = (warped * vmask + img_b * (~vmask)).astype(np.uint8)

    import PIL.Image

    out_path = args.out or "homography_output.png"
    PIL.Image.fromarray(overlay).save(out_path)
    print(f"painted overlay -> {out_path}")
    save_corr_visualization(img_a, img_b, corrs,
                            out_path.replace(".png", "_corrs.png"))


if __name__ == "__main__":
    main()
