"""Facial-landmark transfer (reference demo_face.py): 68 landmarks as fixed
queries, confidence-filtered (force=False), stretching mode."""

import argparse

import numpy as np

from demo_utils import (SAMPLE_DIR, add_common_args, build_engine, load_image,
                        save_corr_visualization)


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--img_a", default=f"{SAMPLE_DIR}/imgs/face_1.png")
    ap.add_argument("--img_b", default=f"{SAMPLE_DIR}/imgs/face_2.png")
    ap.add_argument("--landmarks",
                    default=f"{SAMPLE_DIR}/face_landmarks.npy")
    args = ap.parse_args()

    engine = build_engine(args, mode="stretching")
    img_a = load_image(args.img_a)
    img_b = load_image(args.img_b)
    landmarks = np.load(args.landmarks)
    if landmarks.ndim == 3:
        landmarks = landmarks[0]
    print(f"{len(landmarks)} landmark queries")

    corrs = engine.cotr_corr_multiscale(
        img_a, img_b, zoom_ins=list(np.linspace(0.5, 0.0625, 4)),
        converge_iters=1, max_corrs=len(landmarks), queries_a=landmarks,
        force=False)
    print(f"{corrs.shape[0]} confident landmark transfers")
    save_corr_visualization(img_a, img_b, corrs, args.out or "face_output.png")


if __name__ == "__main__":
    main()
