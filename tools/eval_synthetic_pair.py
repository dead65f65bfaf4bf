"""Evaluate trained weights on a known-homography warped real image.

Ground truth is exact (the warp is synthetic), so this produces the
framework's quantitative accuracy evidence without the released checkpoint
or MegaDepth data: EPE percentiles + PCK for engine correspondences, and
the demo_homography-style painted overlay as a visual artifact (reference
demo_homography.py:36-49 against sample_data/imgs/paint_output.png).

  python tools/eval_synthetic_pair.py \
      --ckpt out/synthetic_run/checkpoints/final --out out/eval_pair
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--image",
                    default="/root/reference/sample_data/imgs/cathedral_1.jpg")
    ap.add_argument("--rep_img",
                    default="/root/reference/sample_data/imgs/"
                            "Meisje_met_de_parel.jpg")
    ap.add_argument("--side", type=int, default=512,
                    help="square side the source image is cropped to")
    ap.add_argument("--jitter", type=float, default=0.15,
                    help="corner jitter fraction of the warp")
    ap.add_argument("--grid", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", default=None,
                    help="comma list of warp seeds, e.g. 0,1,2 — metrics are "
                         "pooled over all seeds' queries (single-seed numbers "
                         "are optimistic/pessimistic samples: the warp "
                         "difficulty varies a lot by seed)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--max_load", type=int, default=256)
    ap.add_argument("--zoom_depth", type=int, default=4,
                    help="levels in the linspace(0.5, 0.0625, N) ladder "
                         "(4 = the demos' schedule)")
    ap.add_argument("--converge_iters", type=int, default=1)
    ap.add_argument("--out", default="out/eval_pair")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import numpy as np
    import PIL.Image

    from cotr_tpu import COTRConfig, build_model
    from cotr_tpu.inference import ModelRunner
    from cotr_tpu.inference.engine import FasterSparseEngine
    from cotr_tpu.models.checkpoint_io import load_params
    from cotr_tpu.ops.geometry_cv import (apply_homography,
                                          homography_from_4pts,
                                          warp_perspective)

    img = np.array(PIL.Image.open(args.image).convert("RGB"))
    h, w = img.shape[:2]
    side = min(args.side, h, w)
    y0, x0 = (h - side) // 2, (w - side) // 2
    img_a = np.ascontiguousarray(img[y0:y0 + side, x0:x0 + side])

    cfg = COTRConfig(dtype=args.dtype, use_flash_attention=True)
    model = build_model(cfg)
    params = load_params(args.ckpt, cfg)
    engine = FasterSparseEngine(ModelRunner(model, params), mode="tile",
                                max_load=args.max_load)
    from cotr_tpu.utils.constants import zoom_ladder
    zoom_ins = zoom_ladder(args.zoom_depth)

    def warp_for_seed(seed):
        """Known perspective warp (same family the synthetic task trains on)."""
        rng = np.random.RandomState(seed)
        s = float(side - 1)
        corners = np.array([[0.0, 0], [s, 0], [s, s], [0, s]], np.float64)
        jit = rng.uniform(-args.jitter, args.jitter, (4, 2)) * s
        h_mat = homography_from_4pts(corners, corners + jit)
        img_b = np.asarray(warp_perspective(
            img_a.astype(np.float32), h_mat, (side, side))).astype(np.uint8)
        return h_mat, img_b

    def eval_seed(seed):
        # fresh engine RNG per seed: squad-formation permutations otherwise
        # advance a shared stream, making per_seed rows depend on the
        # order/composition of --seeds (not reproducible standalone)
        engine.rng = np.random.RandomState(10_000 + seed)
        h_mat, img_b = warp_for_seed(seed)
        # GT-covered query grid (away from borders so targets stay inside)
        lin = np.linspace(side * 0.1, side * 0.9, args.grid)
        gx, gy = np.meshgrid(lin, lin)
        queries = np.stack([gx.ravel(), gy.ravel()], axis=1)
        gt = apply_homography(h_mat, queries)
        ok = ((gt >= 0) & (gt <= side - 1)).all(axis=1)
        queries, gt = queries[ok], gt[ok]
        corrs = engine.cotr_corr_multiscale(
            img_a, img_b, zoom_ins=zoom_ins, converge_iters=args.converge_iters,
            max_corrs=len(queries), queries_a=queries.copy(), force=True)
        return np.linalg.norm(corrs[:, 2:] - gt, axis=1)

    def summarize(epe):
        return {
            "epe_mean_px": round(float(epe.mean()), 2),
            "epe_median_px": round(float(np.median(epe)), 2),
            "epe_p90_px": round(float(np.percentile(epe, 90)), 2),
            "epe_p95_px": round(float(np.percentile(epe, 95)), 2),
            "pck@1px": round(float((epe < 1).mean()), 4),
            "pck@3px": round(float((epe < 3).mean()), 4),
            "pck@5px": round(float((epe < 5).mean()), 4),
        }

    seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
             else [args.seed])
    per_seed = {s: eval_seed(s) for s in seeds}
    pooled = np.concatenate(list(per_seed.values()))
    stats = {
        "image": os.path.basename(args.image), "side": side,
        "queries": int(pooled.shape[0]), "zoom_depth": len(zoom_ins),
        "seeds": seeds,
        **summarize(pooled),
    }
    if len(seeds) > 1:
        stats["per_seed"] = {str(s): summarize(e) for s, e in per_seed.items()}
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "eval_pair.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))
    h_mat, img_b = warp_for_seed(seeds[0])

    # demo_homography-style artifact: match the 4 corners of a centered
    # painting region and composite the replacement image through them.
    # Reseed like eval_seed does: otherwise the squad permutations consumed
    # here depend on how many seeds ran above, and the seed-0 artifact would
    # differ between `--seeds 0` and `--seeds 0,1,2`.
    engine.rng = np.random.RandomState(20_000 + seeds[0])
    pad = side * 0.25
    region = np.array([[pad, pad], [side - pad, pad],
                       [pad, side - pad], [side - pad, side - pad]])
    corner_corrs = engine.cotr_corr_multiscale(
        img_a, img_b, zoom_ins=zoom_ins, converge_iters=args.converge_iters, max_corrs=4,
        queries_a=region.copy(), force=True)
    rep = np.array(PIL.Image.open(args.rep_img).convert("RGB"))
    rh, rw = rep.shape[:2]
    rep_corners = np.array([[0, 0], [rw, 0], [0, rh], [rw, rh]], np.float64)
    hm = homography_from_4pts(rep_corners, corner_corrs[:, 2:])
    warped = warp_perspective(rep.astype(np.float32), hm, (side, side))
    mask = warp_perspective(np.ones((rh, rw, 1), np.float32), hm,
                            (side, side)) > 0
    overlay = np.asarray(warped * mask + img_b * (~mask)).astype(np.uint8)
    out_png = os.path.join(args.out, "painted_overlay.png")
    PIL.Image.fromarray(overlay).save(out_png)
    gt_corners = apply_homography(h_mat, region)
    corner_err = np.linalg.norm(corner_corrs[:, 2:] - gt_corners, axis=1)
    print(f"painted overlay -> {out_png} "
          f"(corner EPE: {np.round(corner_err, 2).tolist()} px)")


if __name__ == "__main__":
    main()
