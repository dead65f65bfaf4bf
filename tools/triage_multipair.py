"""Profile the multipair dispatch-floor regime (VERDICT r4 weak #6 / next #9).

The 64-pair small-job regime (bench `multipair_dispatch_floor`) gets only
~2.5x over the serial loop. This tool breaks one batched call into its
cost centers by timing, in-process:

  * dense seed pass for all pairs (`_dense_fields_many` — one batched
    device program);
  * image-stack build + upload (`_stack_images` — ~25 MB over a
    ~30 MB/s tunnel in the 64-pair regime);
  * host squad formation (form_squads, summed over pairs/levels/iters);
  * device dispatch enqueue (dispatch_indexed call sites);
  * materialization waits (np.asarray on in-flight results) + conclude.

Whatever the host/device split says picks the next move: batch the host
work if it dominates, or write the dispatch floor into PERF.md if the
~24 ms/call sync floor does. Writes out/triage_multipair.json.

  python tools/triage_multipair.py --pairs 64 --queries 32
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--side", type=int, default=256)
    ap.add_argument("--zooms", default="0.5,0.25")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--ckpt", default="checkpoints/flagship.npz")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--seed_stride", type=int, default=1)
    ap.add_argument("--out", default="out/triage_multipair.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np

    from cotr_tpu import COTRConfig, build_model
    from cotr_tpu.inference import engine as eng_mod
    from cotr_tpu.inference import grouped as grp_mod
    from cotr_tpu.inference.engine import FasterSparseEngine
    from cotr_tpu.inference.runner import ModelRunner
    from cotr_tpu.models.checkpoint_io import load_params

    cfg = COTRConfig(dtype=args.dtype, use_flash_attention=True)
    model = build_model(cfg)
    params = load_params(args.ckpt, cfg)
    runner = ModelRunner(model, params)
    engine = FasterSparseEngine(runner, mode="tile",
                                seed_stride=args.seed_stride)

    zoom_ins = [float(z) for z in args.zooms.split(",")]
    imr = np.random.RandomState(0)
    side = args.side
    mp_imgs = [(imr.randint(0, 255, (side, side, 3), dtype=np.uint8),
                imr.randint(0, 255, (side, side, 3), dtype=np.uint8))
               for _ in range(args.pairs)]
    mp_queries = [imr.uniform(8, side - 8, (args.queries, 2)
                              ).astype(np.float64)
                  for _ in range(args.pairs)]

    # ---- timed wrappers around the cost centers (accumulate per call)
    acc = {}

    def timed(obj, name, key):
        orig = getattr(obj, name)

        def wrap(*a, **kw):
            t0 = time.perf_counter()
            out = orig(*a, **kw)
            acc[key] = acc.get(key, 0.0) + time.perf_counter() - t0
            acc[key + "_calls"] = acc.get(key + "_calls", 0) + 1
            return out
        setattr(obj, name, wrap)
        return orig

    origs = [
        (engine, "_dense_fields_many",
         timed(engine, "_dense_fields_many", "dense_seed_s")),
        (engine, "_stack_images",
         timed(engine, "_stack_images", "image_stack_upload_s")),
        (grp_mod, "form_squads",
         timed(grp_mod, "form_squads", "squad_formation_s")),
        (engine._stepper, "dispatch_indexed",
         timed(engine._stepper, "dispatch_indexed", "dispatch_enqueue_s")),
    ]

    def job():
        engine.cotr_corr_multiscale_multipair(
            mp_imgs, zoom_ins=zoom_ins, max_corrs=args.queries,
            queries_list=[q.copy() for q in mp_queries], force=True,
            pair_seeds=list(range(args.pairs)))

    job()  # warm every bucket (not timed)
    acc.clear()
    walls = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        job()
        walls.append(time.perf_counter() - t0)
    for obj, name, orig in origs:
        setattr(obj, name, orig)

    wall = float(np.median(walls))
    per_trial = {k: round(v / args.trials, 3) for k, v in acc.items()
                 if not k.endswith("_calls")}
    calls = {k: v // args.trials for k, v in acc.items()
             if k.endswith("_calls")}
    accounted = sum(per_trial.values())
    report = {
        "pairs": args.pairs, "queries_per_pair": args.queries,
        "seed_stride": args.seed_stride,
        "zoom_depth": len(zoom_ins), "image_side": side,
        "wall_s_median": round(wall, 3),
        "wall_s_all": [round(w, 3) for w in walls],
        "q_s": round(args.pairs * args.queries / wall, 1),
        "cost_centers_s_per_trial": per_trial,
        "calls_per_trial": calls,
        "unaccounted_s": round(wall - accounted, 3),
        "note": ("dispatch_enqueue is ASYNC enqueue time only; device "
                 "compute + materialization waits land in unaccounted "
                 "together with host table building and conclude"),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
