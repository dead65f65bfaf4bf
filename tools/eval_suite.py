"""Statistically meaningful accuracy suite for trained weights.

Extends tools/eval_synthetic_pair.py (2 textures x 3 seeds x 428 queries)
to a suite whose pooled metrics are stable enough to rank checkpoints
(VERDICT r4 weak #2: per-seed medians swung 4.3 -> 16.8 px, so a 2-image
3-seed eval cannot tell a better checkpoint from a lucky warp):

* >=6 held-out textures: the 4 real eval images the training glob excludes
  (SyntheticHomographyDataset.EVAL_TEXTURES) + N procedural textures drawn
  from an eval-only RNG stream disjoint from every training pool seed;
* >=5 known-homography warp seeds per texture, >=1000 pooled queries per
  texture (grid**2 per seed x seeds);
* pooled median EPE / PCK with a bootstrap 95% CI over (texture, seed)
  cells — resampling whole cells keeps the CI honest about warp-level
  correlation (queries within one warp share its difficulty);
* leave-one-seed-out pooled metrics, so checkpoint ranking can be checked
  for stability against the seed set.

Ground truth is exact (the warp is synthetic), mirroring the role of the
reference's val protocol (/root/reference/COTR/trainers/cotr_trainer.py:54-73)
without MegaDepth data.

  python tools/eval_suite.py --ckpt checkpoints/flagship.npz --out out/eval_suite
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REAL_EVAL_IMAGES = (
    "/root/reference/sample_data/imgs/cathedral_1.jpg",
    "/root/reference/sample_data/imgs/cathedral_2.jpg",
    "/root/reference/sample_data/imgs/petrzin_01.png",
    "/root/reference/sample_data/imgs/petrzin_02.png",
)

# eval-only procedural texture stream: training pools derive their texture
# RNG from the dataset seed as (seed*7_368_787 + 0x5EED) % 2**32
# (data/synthetic.py); this base is not congruent to that map for any seed
# used by the committed training recipes (seeds 1 / 777).
PROC_EVAL_SEED_BASE = 0xE7A1_0000


def summarize(epe):
    import numpy as np
    return {
        "epe_mean_px": round(float(epe.mean()), 2),
        "epe_median_px": round(float(np.median(epe)), 2),
        "epe_p90_px": round(float(np.percentile(epe, 90)), 2),
        "epe_p95_px": round(float(np.percentile(epe, 95)), 2),
        "pck@1px": round(float((epe < 1).mean()), 4),
        "pck@3px": round(float((epe < 3).mean()), 4),
        "pck@5px": round(float((epe < 5).mean()), 4),
        "n": int(epe.shape[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--side", type=int, default=512)
    ap.add_argument("--jitter", type=float, default=0.15)
    ap.add_argument("--grid", type=int, default=15,
                    help="grid**2 queries per (texture, seed) cell; "
                         "15**2 x 5 seeds = 1125 pooled per texture")
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--proc", type=int, default=4,
                    help="procedural eval-only textures appended to the 4 "
                         "real held-out images")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--max_load", type=int, default=256)
    ap.add_argument("--zoom_depth", type=int, default=4)
    ap.add_argument("--converge_iters", type=int, default=1)
    ap.add_argument("--cycle_select", nargs="?", const=True, default=False,
                    type=lambda v: {"rescue": "rescue", "true": True}[v],
                    help="engine-side cycle-scored candidate selection "
                         "(engine.cotr_corr_multiscale(cycle_select=True)): "
                         "replaces diverged force=True outputs with the "
                         "best zoom-history candidate by reverse cycle "
                         "error (tools/diagnose_tail.py round-5 fix)")
    ap.add_argument("--bootstrap", type=int, default=2000)
    ap.add_argument("--out", default="out/eval_suite")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import numpy as np
    import PIL.Image

    from cotr_tpu import COTRConfig, build_model
    from cotr_tpu.data.synthetic import make_procedural_texture
    from cotr_tpu.inference import ModelRunner
    from cotr_tpu.inference.engine import FasterSparseEngine
    from cotr_tpu.models.checkpoint_io import load_params
    from cotr_tpu.ops.geometry_cv import (apply_homography,
                                          homography_from_4pts,
                                          warp_perspective)
    from cotr_tpu.utils.constants import zoom_ladder

    side = args.side
    textures = {}
    for p in REAL_EVAL_IMAGES:
        img = np.array(PIL.Image.open(p).convert("RGB"))
        h, w = img.shape[:2]
        s = min(side, h, w)
        y0, x0 = (h - s) // 2, (w - s) // 2
        crop = np.ascontiguousarray(img[y0:y0 + s, x0:x0 + s])
        if s != side:
            crop = np.array(PIL.Image.fromarray(crop).resize(
                (side, side), PIL.Image.BILINEAR))
        textures[os.path.basename(p)] = crop
    for i in range(args.proc):
        rng = np.random.RandomState((PROC_EVAL_SEED_BASE + i) % (2 ** 32))
        textures[f"proc_eval_{i}"] = make_procedural_texture(rng, size=side)

    cfg = COTRConfig(dtype=args.dtype, use_flash_attention=True)
    model = build_model(cfg)
    params = load_params(args.ckpt, cfg)
    engine = FasterSparseEngine(ModelRunner(model, params), mode="tile",
                                max_load=args.max_load)
    zoom_ins = zoom_ladder(args.zoom_depth)
    seeds = [int(s) for s in args.seeds.split(",")]

    def eval_cell(img_a, seed):
        engine.rng = np.random.RandomState(10_000 + seed)
        rng = np.random.RandomState(seed)
        s = float(side - 1)
        corners = np.array([[0.0, 0], [s, 0], [s, s], [0, s]], np.float64)
        jit = rng.uniform(-args.jitter, args.jitter, (4, 2)) * s
        h_mat = homography_from_4pts(corners, corners + jit)
        img_b = np.asarray(warp_perspective(
            img_a.astype(np.float32), h_mat, (side, side))).astype(np.uint8)
        lin = np.linspace(side * 0.1, side * 0.9, args.grid)
        gx, gy = np.meshgrid(lin, lin)
        queries = np.stack([gx.ravel(), gy.ravel()], axis=1)
        gt = apply_homography(h_mat, queries)
        ok = ((gt >= 0) & (gt <= side - 1)).all(axis=1)
        queries, gt = queries[ok], gt[ok]
        corrs = engine.cotr_corr_multiscale(
            img_a, img_b, zoom_ins=zoom_ins,
            converge_iters=args.converge_iters,
            max_corrs=len(queries), queries_a=queries.copy(), force=True,
            cycle_select=args.cycle_select)
        return np.linalg.norm(corrs[:, 2:] - gt, axis=1)

    import time
    cells = {}  # (texture, seed) -> epe array
    for name, img_a in textures.items():
        for seed in seeds:
            t0 = time.time()
            cells[(name, seed)] = eval_cell(img_a, seed)
            print(f"{name} seed {seed}: "
                  f"median {np.median(cells[(name, seed)]):.2f}px "
                  f"n={cells[(name, seed)].shape[0]} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    per_texture = {}
    for name in textures:
        pool = np.concatenate([cells[(name, s)] for s in seeds])
        per_texture[name] = summarize(pool)
        per_texture[name]["per_seed_median_px"] = {
            str(s): round(float(np.median(cells[(name, s)])), 2)
            for s in seeds}

    pooled = np.concatenate(list(cells.values()))

    # bootstrap over (texture, seed) cells: resample cells with
    # replacement, pool, recompute — captures warp-level correlation
    cell_list = list(cells.values())
    brng = np.random.RandomState(0)
    boot_median, boot_pck5 = [], []
    for _ in range(args.bootstrap):
        idx = brng.randint(0, len(cell_list), len(cell_list))
        bp = np.concatenate([cell_list[i] for i in idx])
        boot_median.append(np.median(bp))
        boot_pck5.append((bp < 5).mean())
    ci = lambda v: [round(float(np.percentile(v, 2.5)), 2),
                    round(float(np.percentile(v, 97.5)), 2)]

    # leave-one-seed-out pooled medians: checkpoint ranking is trustworthy
    # when these agree with the full-pool ordering
    loso = {}
    for drop in seeds:
        sub = np.concatenate([e for (n, s), e in cells.items() if s != drop])
        loso[f"without_seed_{drop}"] = {
            "epe_median_px": round(float(np.median(sub)), 2),
            "pck@5px": round(float((sub < 5).mean()), 4)}

    stats = {
        "suite": "eval_suite_v1", "cycle_select": args.cycle_select,
        "ckpt": os.path.abspath(args.ckpt),
        "side": side, "zoom_depth": len(zoom_ins),
        "textures": list(textures.keys()), "seeds": seeds,
        "queries_total": int(pooled.shape[0]),
        "pooled": summarize(pooled),
        "epe_median_px_ci95": ci(boot_median),
        "pck@5px_ci95": [round(float(np.percentile(boot_pck5, 2.5)), 4),
                         round(float(np.percentile(boot_pck5, 97.5)), 4)],
        "leave_one_seed_out": loso,
        "per_texture": per_texture,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "eval_suite.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps({k: stats[k] for k in
                      ("pooled", "epe_median_px_ci95", "pck@5px_ci95")}))
    print(f"wrote {os.path.join(args.out, 'eval_suite.json')}")


if __name__ == "__main__":
    main()
