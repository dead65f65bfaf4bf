"""MegaDepth validation sweep: dense correspondence EPE vs geometry ground
truth (BASELINE.json config "MegaDepth val sweep: batched multi-pair dense
256x256 query grids, zoom depth 3").

For sampled validation pairs: build the ground-truth flow by lifting the
target capture's depth to world points and projecting into the query camera
(optical_flow_from_a_to_b, reference pcd_projector.py:41-53), run the engine
on a dense query grid at the requested zoom depth, and report end-point-error
statistics over pixels with valid ground truth.

Usage:
  python eval_megadepth.py --dataset_config md.json \
      --load_weights_path checkpoint.pth.tar --pairs 10 --grid 64
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def prepare_pair(query_cap, nn_cap, grid: int):
    """Images, dense query grid, and GT flow for one val pair (or None when
    too little valid ground truth)."""
    from cotr_tpu.geometry.projector import optical_flow_from_a_to_b

    img_a = query_cap.image
    img_b = nn_cap.image
    h, w = img_a.shape[:2]

    gt_flow = optical_flow_from_a_to_b(nn_cap, query_cap)
    # gt_flow[y, x] = pixel in nn_cap for pixel (x, y) of... the reference
    # composes a->b as reprojection of b's cloud into a; invalid pixels are 0
    # Build a query grid over image a where GT exists.
    ys = np.linspace(8, h - 9, grid).astype(int)
    xs = np.linspace(8, w - 9, grid).astype(int)
    gx, gy = np.meshgrid(xs, ys)
    queries = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)

    gt = gt_flow[gy.ravel(), gx.ravel()]
    valid = (np.abs(gt).sum(axis=1) > 0)
    if valid.sum() < 10:
        return None
    return img_a, img_b, queries, gt, valid


def _epe_from_corrs(queries, gt, valid, corrs, idx):
    pred = np.full((len(queries), 2), np.nan)
    pred[idx] = corrs[:, 2:]
    ok = valid & np.isfinite(pred).all(axis=1)
    return np.linalg.norm(pred[ok] - gt[ok], axis=1)


def evaluate_batch(engine, prepped, zoom_ins):
    """One multi-pair engine call over the prepared pairs (BASELINE config
    "batched multi-pair dense grids": pairs share device dispatches instead
    of the reference's serial per-pair loop). Falls back to serial calls for
    engines without the multipair API."""
    if hasattr(engine, "cotr_corr_multiscale_multipair"):
        results = engine.cotr_corr_multiscale_multipair(
            [(p[0], p[1]) for p in prepped], zoom_ins=zoom_ins,
            converge_iters=1,
            max_corrs=[len(p[2]) for p in prepped],
            queries_list=[p[2] for p in prepped], force=True,
            return_idx=True)
    else:
        results = [engine.cotr_corr_multiscale(
            p[0], p[1], zoom_ins=zoom_ins, converge_iters=1,
            max_corrs=len(p[2]), queries_a=p[2], force=True,
            return_idx=True) for p in prepped]
    return [_epe_from_corrs(p[2], p[3], p[4], corrs, idx)
            for p, (corrs, idx) in zip(prepped, results)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_config", required=True)
    ap.add_argument("--load_weights_path", default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pairs", type=int, default=10)
    ap.add_argument("--grid", type=int, default=64,
                    help="dense grid side (grid^2 queries per pair)")
    ap.add_argument("--zoom_depth", type=int, default=3)
    ap.add_argument("--faster_infer", default="yes")
    ap.add_argument("--batch_size", type=int, default=1024)
    ap.add_argument("--pair_batch", type=int, default=8,
                    help="image pairs refined per multi-pair engine call "
                         "(pairs share device dispatches)")
    ap.add_argument("--max_corrs", type=int, default=100000)
    ap.add_argument("--out", default="eval_megadepth.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

    import sys

    sys.path.insert(0, "demos")
    from demos.demo_utils import build_engine

    from cotr_tpu.data import DataConfig, MegadepthDataset

    with open(args.dataset_config) as f:
        raw = json.load(f)
    data_cfg = DataConfig(
        scenes_name_list=raw["scenes_name_list"],
        valid_list_json=raw["valid_list_json"],
        train_json=raw["train_json"], val_json=raw["val_json"],
        test_json=raw.get("test_json", raw["val_json"]),
        crop_cam="no_crop")
    ds = MegadepthDataset(data_cfg, "val")
    engine = build_engine(args, mode="stretching")

    # depth-N ladder always ends at the finest 0.0625 zoom; the earlier
    # [:depth] truncation silently dropped the finest level and capped
    # accuracy at the coarsest final crop.
    from cotr_tpu.utils.constants import zoom_ladder
    zooms = zoom_ladder(args.zoom_depth)
    all_epe = []
    t0 = time.time()
    n_pairs = min(args.pairs, ds.num_queries)
    # prepare only one pair_batch ahead: full-res images + GT flows are big,
    # and materializing every pair before the first engine call held
    # O(n_pairs) of them in RAM; pair indices printed are DATASET indices
    # (skipped pairs keep the numbering aligned across runs)
    chunk, chunk_idx = [], []

    def flush():
        for j, epe in enumerate(evaluate_batch(engine, chunk, zooms)):
            all_epe.append(epe)
            print(f"pair {chunk_idx[j]}: {len(epe)} valid, "
                  f"EPE mean {epe.mean():.2f} median {np.median(epe):.2f}")
        chunk.clear()
        chunk_idx.clear()

    for i in range(n_pairs):
        query_cap, nn_caps = ds.get_query_with_knn(i)
        p = prepare_pair(query_cap, nn_caps[0], args.grid)
        if p is None:
            continue
        chunk.append(p)
        chunk_idx.append(i)
        if len(chunk) == args.pair_batch:
            flush()
    if chunk:
        flush()
    dt = time.time() - t0

    epe = np.concatenate(all_epe) if all_epe else np.array([np.nan])
    result = {
        "epe_mean": float(np.mean(epe)),
        "epe_median": float(np.median(epe)),
        "pck_1px": float((epe < 1).mean()),
        "pck_3px": float((epe < 3).mean()),
        "pck_5px": float((epe < 5).mean()),
        "pairs": len(all_epe),
        "queries": int(epe.size),
        "wall_s": round(dt, 1),
    }
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
