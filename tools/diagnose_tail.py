"""Classify the accuracy tail: WHY are p90 errors ~10x the median?

Runs eval-suite cells (synthetic warps, exact ground truth — see
tools/eval_suite.py) with engine diagnostics on, then classifies every
tail query (final EPE > --tail_px) from its full zoom history
(seed + one row per zoom level, engine.last_diag):

* seed_blind      — the dense-pass seed missed by more than the FIRST zoom
                    level's patch half-size: the true target never entered
                    any crop the refiner looked at, so no amount of zoom
                    could recover it (fix: better seeding, not refinement);
* diverged        — the seed was inside the first patch but refinement moved
                    AWAY (final EPE > seed EPE + 1px);
* filter_flagged  — the reference's own std/border filters
                    (refinement_task.py:184-188, sparse_engine.py:58-84)
                    would have dropped it, but force=True returns it anyway
                    (fix: confidence-aware output, not accuracy);
* converged_wrong — refined monotonically into the wrong basin (< seed EPE
                    but still > tail_px and unflagged): genuine model error.

The dominant class picks the round's fix. Writes one JSON with per-class
counts, per-class EPE stats, and per-(texture, seed) breakdowns.

  python tools/diagnose_tail.py --ckpt checkpoints/flagship.npz
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.eval_suite import PROC_EVAL_SEED_BASE, REAL_EVAL_IMAGES  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--side", type=int, default=512)
    ap.add_argument("--jitter", type=float, default=0.15)
    ap.add_argument("--grid", type=int, default=15)
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--proc", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tail_px", type=float, default=5.0)
    ap.add_argument("--zoom_depth", type=int, default=4)
    ap.add_argument("--cycle_select", nargs="?", const=True,
                    default=False,
                    type=lambda v: {"rescue": "rescue", "true": True}[v],
                    help="enable the engine's cycle-scored candidate "
                         "selection and classify its OUTPUTS (what-if "
                         "measurement of the round-5 divergence fix)")
    ap.add_argument("--engine", default="faster", choices=["faster", "base"],
                    help="faster = grouped squads (production eval config); "
                         "base = per-task crops (isolates grouping effects)")
    ap.add_argument("--max_load", type=int, default=256)
    ap.add_argument("--out", default="out/diagnose_tail")
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
    from cotr_tpu.inference.engine import FasterSparseEngine, SparseEngine
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
    runner = ModelRunner(model, params)
    if args.engine == "faster":
        engine = FasterSparseEngine(runner, mode="tile",
                                    max_load=args.max_load)
    else:
        engine = SparseEngine(runner, mode="tile")
    engine.collect_diagnostics = True
    zoom_ins = zoom_ladder(args.zoom_depth)
    seeds = [int(s) for s in args.seeds.split(",")]

    rows = []  # one dict per query
    for name, img_a in textures.items():
        for seed in seeds:
            engine.rng = np.random.RandomState(10_000 + seed)
            rng = np.random.RandomState(seed)
            s = float(side - 1)
            corners = np.array([[0.0, 0], [s, 0], [s, s], [0, s]],
                               np.float64)
            jit = rng.uniform(-args.jitter, args.jitter, (4, 2)) * s
            h_mat = homography_from_4pts(corners, corners + jit)
            img_b = np.asarray(warp_perspective(
                img_a.astype(np.float32), h_mat,
                (side, side))).astype(np.uint8)
            lin = np.linspace(side * 0.1, side * 0.9, args.grid)
            gx, gy = np.meshgrid(lin, lin)
            queries = np.stack([gx.ravel(), gy.ravel()], axis=1)
            gt = apply_homography(h_mat, queries)
            ok = ((gt >= 0) & (gt <= side - 1)).all(axis=1)
            queries, gt = queries[ok], gt[ok]

            engine.cotr_corr_multiscale(
                img_a, img_b, zoom_ins=zoom_ins, converge_iters=1,
                max_corrs=len(queries), queries_a=queries.copy(), force=True,
                cycle_select=args.cycle_select)
            d = engine.last_diag
            # histories are task-ordered; force=True keeps task order ==
            # query order (ident = arange)
            hist = d["history"]                       # (1+Z, T, 2)
            if args.cycle_select:
                # classify the SELECTED outputs: append them as the row the
                # tail metrics read (the raw history stays for seed/level
                # context)
                hist = np.concatenate([hist, d["selected"][None]], axis=0)
            epes = np.linalg.norm(hist - gt[None], axis=2)  # (1+Z, T)
            # first zoom level's patch half-size on the TARGET side: the
            # refiner crops the b patch centered at the seed, so a seed
            # error beyond this half-size leaves the true target outside
            # every crop at that level (patch_box semantics, refine.py)
            s_to = 1.0  # square, same-size pair -> relative scale 1
            half0 = side * s_to * zoom_ins[0] / 2.0
            for ti in range(hist.shape[1]):
                rows.append({
                    "texture": name, "seed": seed,
                    "seed_epe": float(epes[0, ti]),
                    "level_epes": [float(e) for e in epes[1:, ti]],
                    "final_epe": float(epes[-1, ti]),
                    "half0": half0,
                    "kept": bool(d["kept_by_filters"][ti])})
            n_tail = sum(1 for r in rows[-hist.shape[1]:]
                         if r["final_epe"] > args.tail_px)
            print(f"{name} seed {seed}: median "
                  f"{np.median(epes[-1]):.2f}px, tail {n_tail}/"
                  f"{hist.shape[1]}", flush=True)

    def classify(r):
        if r["final_epe"] <= args.tail_px:
            return "ok"
        if r["seed_epe"] > r["half0"]:
            return "seed_blind"
        if r["final_epe"] > r["seed_epe"] + 1.0:
            return "diverged"
        if not r["kept"]:
            return "filter_flagged"
        return "converged_wrong"

    classes = {}
    for r in rows:
        classes.setdefault(classify(r), []).append(r)

    def stats(rs):
        e = np.array([r["final_epe"] for r in rs])
        se = np.array([r["seed_epe"] for r in rs])
        return {"n": len(rs), "frac_of_all": round(len(rs) / len(rows), 4),
                "final_epe_median": round(float(np.median(e)), 2),
                "final_epe_p90": round(float(np.percentile(e, 90)), 2),
                "seed_epe_median": round(float(np.median(se)), 2)}

    all_final = np.array([r["final_epe"] for r in rows])
    tail = [r for r in rows if r["final_epe"] > args.tail_px]
    report = {
        "ckpt": os.path.abspath(args.ckpt), "engine": args.engine,
        "cycle_select": args.cycle_select,
        "tail_px": args.tail_px, "queries": len(rows),
        "pooled": {"median": round(float(np.median(all_final)), 2),
                   "p90": round(float(np.percentile(all_final, 90)), 2),
                   "tail_frac": round(len(tail) / len(rows), 4)},
        "classes": {k: stats(v) for k, v in sorted(
            classes.items(), key=lambda kv: -len(kv[1]))},
        "tail_class_shares": {
            k: round(len(v) / max(len(tail), 1), 4)
            for k, v in classes.items() if k != "ok"},
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "diagnose_tail.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"pooled": report["pooled"],
                      "tail_class_shares": report["tail_class_shares"]}))
    print(f"wrote {os.path.join(args.out, 'diagnose_tail.json')}")


if __name__ == "__main__":
    main()
