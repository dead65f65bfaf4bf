"""Benchmark: correspondence queries/sec/chip at zoom depth 3.

Measures the grouped refinement pipeline (the framework's production path,
equivalent regime to the reference FasterSparseEngine / guided-matching
workload): G crop-pair canvases per zoom step, M queries sharing each
canvas's encode, 3 zoom levels. Every step runs the REAL pipeline on device:
pyramid crop-and-resize -> canvas normalize -> ResNet+encoder encode ->
M-query decode.

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "queries/sec/chip", "vs_baseline": N}
vs_baseline is against the 50k q/s/chip target (BASELINE.json north_star).
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for a fast smoke run")
    ap.add_argument("--groups", type=int, default=None,
                    help="canvas pairs per zoom step")
    ap.add_argument("--members", type=int, default=None,
                    help="queries per canvas")
    ap.add_argument("--zooms", type=int, default=3)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--flash", default=True,
                    type=lambda v: str(v).lower() not in ("no", "false", "0"),
                    help="use the fused Pallas cross-attention kernel "
                         "(default yes; pass --flash no to disable)")
    args = ap.parse_args()
    if args.quick and not any(a.startswith("--flash") for a in sys.argv):
        # quick smoke: skip the Pallas kernel (fresh compiles for the tiny
        # shapes dominate the run); the full bench uses it by default
        args.flash = False

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cotr_tpu import COTRConfig, build_model
    from cotr_tpu.inference.grouped import GroupedStepper
    from cotr_tpu.inference.runner import ModelRunner

    groups = args.groups or (2 if args.quick else 16)
    members = args.members or (32 if args.quick else 4096)
    iters = args.iters or (2 if args.quick else 10)

    cfg = COTRConfig(dtype=args.dtype, use_flash_attention=args.flash)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, 256, 512, 3)),
                                 jnp.zeros((1, 8, 2)))
    runner = ModelRunner(model, params)
    crop_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    stepper = GroupedStepper(runner, crop_dtype=crop_dtype)

    # synthetic 1024x1024 image pair (guided-matching scale)
    imr = np.random.RandomState(0)
    img = jnp.asarray(
        imr.uniform(0, 1, (1024, 1024, 3)).astype(np.float32))

    # boxes: random positions, zoom-depth-3 style sizes (0.5, 0.21, 0.0625
    # of the short side)
    zoom_sizes = [512.0, 212.0, 64.0][:args.zooms]
    queries = imr.uniform(0.05, 0.45, (groups, members, 2)).astype(np.float32)

    # pre-build per-zoom device inputs (the engine's host work is squad
    # formation; here we measure the device pipeline: crop+encode+decode)
    q_dev = jnp.asarray(queries)
    boxes_per_zoom = []
    for zs in zoom_sizes:
        xy = imr.uniform(0, 1024 - zs, (groups, 2)).astype(np.float32)
        boxes_per_zoom.append(jnp.asarray(np.concatenate(
            [xy, np.full((groups, 2), zs, np.float32)], axis=1)))

    def one_depth(boxes):
        return stepper._step(runner.params, img, img, boxes, boxes, q_dev)

    # warmup / compile
    np.asarray(one_depth(boxes_per_zoom[0]))
    for b in boxes_per_zoom[1:]:
        np.asarray(one_depth(b))

    # steps enqueue FIFO on the single device stream; syncing the final
    # output bounds the whole pipeline (block_until_ready is unreliable on
    # the axon tunnel backend)
    t0 = time.time()
    for _ in range(iters):
        for b in boxes_per_zoom:
            out = one_depth(b)
    np.asarray(out)
    dt = time.time() - t0

    total_query_zooms = iters * len(zoom_sizes) * groups * members
    # one "correspondence query at zoom depth Z" = Z refinement forwards
    queries_per_sec = total_query_zooms / len(zoom_sizes) / dt

    baseline = 50_000.0
    result = {
        "metric": "correspondence queries/sec/chip at zoom depth 3",
        "value": round(queries_per_sec, 1),
        "unit": "queries/sec/chip",
        "vs_baseline": round(queries_per_sec / baseline, 4),
        "detail": {
            "groups": groups, "members": members, "zoom_depth": len(zoom_sizes),
            "iters": iters, "dtype": args.dtype, "wall_s": round(dt, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
