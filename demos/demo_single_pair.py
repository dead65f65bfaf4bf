"""Sparse + dense matching on a single image pair
(reference demo_single_pair.py): bidirectional cycle-consistent multiscale
matching, Delaunay densification, warp of B onto A."""

import argparse

import numpy as np

from demo_utils import (SAMPLE_DIR, add_common_args, build_engine, load_image,
                        save_corr_visualization)


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--img_a", default=f"{SAMPLE_DIR}/imgs/cathedral_1.jpg")
    ap.add_argument("--img_b", default=f"{SAMPLE_DIR}/imgs/cathedral_2.jpg")
    ap.add_argument("--densify", action="store_true")
    args = ap.parse_args()

    engine = build_engine(args, mode="tile")
    img_a = load_image(args.img_a)
    img_b = load_image(args.img_b)

    corrs = engine.cotr_corr_multiscale_with_cycle_consistency(
        img_a, img_b, zoom_ins=list(np.linspace(0.5, 0.0625, 4)),
        converge_iters=1, max_corrs=args.max_corrs)
    print(f"found {corrs.shape[0]} correspondences")
    save_corr_visualization(img_a, img_b, corrs,
                            args.out or "sparse_output.png")

    if args.densify and corrs.shape[0] >= 3:
        from cotr_tpu.inference.triangulate import triangulate_corr
        from cotr_tpu.ops.sampling import _gather_bilinear
        import jax.numpy as jnp

        dense = triangulate_corr(corrs, img_a.shape, img_b.shape)
        if dense is not None:
            warped = np.asarray(_gather_bilinear(
                jnp.asarray(img_b, jnp.float32),
                jnp.asarray(dense[..., 0]), jnp.asarray(dense[..., 1])))
            import imageio.v2 as imageio
            imageio.imwrite("dense_output.png",
                            np.clip(warped, 0, 255).astype(np.uint8))
            print("wrote dense_output.png")


if __name__ == "__main__":
    main()
