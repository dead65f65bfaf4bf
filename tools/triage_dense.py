"""Triage the round-3 dense_flow bench swing (VERDICT r3 weak #3).

Times the public dense_flow end-to-end over N trials (median + IQR) and
splits one call into phases: canvas build+upload, device pass (encode +
131k-query decode + cycle), host PIL field resizes, min-conf merge. Run on
the TPU chip to distinguish chip contention from a host-side regression.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=7)
    ap.add_argument("--side", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cotr_tpu import COTRConfig, build_model
    from cotr_tpu.inference.dense import (_canvas_from_pair,
                                          _dense_pass_device,
                                          _patch_affine, _resize_field_host,
                                          dense_flow, merge_flow_patches,
                                          to_square_patches, ImagePatch)
    from cotr_tpu.inference.runner import ModelRunner
    from cotr_tpu.models.checkpoint_io import load_params

    cfg = COTRConfig(dtype="bfloat16", use_flash_attention=True)
    model = build_model(cfg)
    params = load_params("/root/repo/checkpoints/flagship.npz", cfg)
    runner = ModelRunner(model, params)

    imr = np.random.RandomState(0)
    sq_a = imr.randint(0, 255, (args.side, args.side, 3), dtype=np.uint8)
    sq_b = imr.randint(0, 255, (args.side, args.side, 3), dtype=np.uint8)

    dense_flow(runner, sq_a, sq_b)  # warm
    walls = []
    for _ in range(args.trials):
        t0 = time.time()
        dense_flow(runner, sq_a, sq_b)
        walls.append(time.time() - t0)
    walls_s = sorted(walls)
    med = walls_s[len(walls_s) // 2]
    q1 = walls_s[len(walls_s) // 4]
    q3 = walls_s[(3 * len(walls_s)) // 4]

    # phase split (single call)
    t0 = time.time()
    canvas = _canvas_from_pair(sq_a, sq_b)
    canvas.block_until_ready()
    t_canvas = time.time() - t0
    t0 = time.time()
    corr = _dense_pass_device(runner, canvas)
    corr.block_until_ready()
    t_device = time.time() - t0
    t0 = time.time()
    corr_np = np.asarray(corr)[0]
    t_fetch = time.time() - t0
    p = to_square_patches(sq_a)[0]
    c_i = corr_np[:, :256].copy()
    s, t = _patch_affine(p)
    c_i[..., :2] = c_i[..., :2] * s + t
    t0 = time.time()
    c_i_big = _resize_field_host(c_i, (p.h, p.w))
    t_resize1 = time.time() - t0  # one of two sides
    t0 = time.time()
    merge_flow_patches([ImagePatch(c_i_big, p.x, p.y, p.w, p.h, p.ow, p.oh)])
    t_merge1 = time.time() - t0  # one of two sides

    print(json.dumps({
        "trials": args.trials,
        "wall_s_all": [round(w, 3) for w in walls],
        "median_s": round(med, 3),
        "iqr_s": [round(q1, 3), round(q3, 3)],
        "q_s_median": round(131072 / med, 1),
        "phase_split_one_call_s": {
            "canvas_build_upload": round(t_canvas, 3),
            "device_pass": round(t_device, 3),
            "fetch": round(t_fetch, 3),
            "host_resize_per_side": round(t_resize1, 3),
            "merge_per_side": round(t_merge1, 3),
        },
    }, indent=1))


if __name__ == "__main__":
    main()
