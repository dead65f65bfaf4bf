"""Structural multi-chip inference evidence (VERDICT r3 next #8).

Runs the two sharded inference paths — the grouped squad stepper and the
scan-path BatchRefiner — at n_devices in {1, 8} on the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu) and
writes a MULTICHIP-style JSON with per-config wall times, per-device work,
and an equality check between the 1- and 8-device outputs.

The host is a single physical core, so 8 virtual devices CANNOT show
wall-clock speedup here; what this run proves is that the sharded programs
compile, execute, partition the task/squad axis 8 ways (per-device canvas
work drops 8x, the quantity that rides real ICI-connected chips), and
produce identical results. Wall times are recorded for completeness only.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_sharded.py --out SHARDED_r04.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SHARDED_r04.json")
    ap.add_argument("--enc_layers", type=int, default=6)
    ap.add_argument("--dec_layers", type=int, default=6)
    ap.add_argument("--groups", type=int, default=16,
                    help="squads (grouped path) / tasks (scan path) "
                         "per dispatch; divisible by 8")
    ap.add_argument("--members", type=int, default=64,
                    help="queries per squad (grouped path)")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    # this environment's sitecustomize imports jax at interpreter startup
    # with the axon (TPU) platform; force the LIVE config to CPU so the
    # 8-virtual-device flag takes effect (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    assert len(jax.devices()) >= 8, (
        "run under XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu")

    from cotr_tpu import COTRConfig, build_model
    from cotr_tpu.inference.grouped import GroupedStepper
    from cotr_tpu.inference.refine import BatchRefiner
    from cotr_tpu.inference.runner import ModelRunner
    from cotr_tpu.parallel.mesh import make_mesh

    cfg = COTRConfig(enc_layers=args.enc_layers, dec_layers=args.dec_layers,
                     dropout=0.0)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)),
                        jnp.zeros((1, 2, 2)))
    runner = ModelRunner(model, params)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 1, (512, 512, 3)).astype(np.float32))
    g, m = args.groups, args.members
    boxes = np.concatenate(
        [rng.uniform(0, 256, (g, 2)).astype(np.float32),
         np.full((g, 2), 256.0, np.float32)], axis=1)
    queries = rng.uniform(0.05, 0.45, (g, m, 2)).astype(np.float32)

    result = {
        "kind": "sharded-inference structural scaling (virtual CPU mesh)",
        "model": {"enc_layers": args.enc_layers,
                  "dec_layers": args.dec_layers},
        "note": ("single-core host: wall times cannot speed up 8x here; "
                 "the evidence is that the squad/task axis partitions 8 "
                 "ways with identical outputs (see tests/"
                 "test_sharded_inference.py for the equality tests)"),
        "configs": {},
    }

    outs = {}
    # ---------------- grouped squad path
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev) if n_dev > 1 else None
        stepper = GroupedStepper(runner, mesh=mesh)
        out = stepper(img, img, boxes, boxes, queries)  # warm/compile
        np.asarray(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = stepper(img, img, boxes, boxes, queries)
        np.asarray(out)
        dt = (time.time() - t0) / args.iters
        outs[("grouped", n_dev)] = np.asarray(out)
        result["configs"][f"grouped_n{n_dev}"] = {
            "squads": g, "queries_per_squad": m,
            "canvases_per_device": g // n_dev,
            "queries_per_dispatch": g * m,
            "wall_s": round(dt, 3),
            "q_s_wall": round(g * m / dt, 1),
        }

    # ---------------- scan path (BatchRefiner zoom recursion)
    tasks = g * m  # comparable query count
    loc = rng.uniform(60.0, 450.0, (tasks, 2))
    zooms = [0.5, 0.25]
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev) if n_dev > 1 else None
        refiner = BatchRefiner(runner, mesh=mesh)
        dev_img, hw = refiner.prepare_image(np.asarray(img))
        hist = refiner.refine(dev_img, hw, dev_img, hw,
                              loc.copy(), loc.copy(), 1.0, 1.0, zooms)
        t0 = time.time()
        for _ in range(args.iters):
            hist = refiner.refine(dev_img, hw, dev_img, hw,
                                  loc.copy(), loc.copy(), 1.0, 1.0, zooms)
        dt = (time.time() - t0) / args.iters
        outs[("scan", n_dev)] = np.asarray(hist)
        result["configs"][f"scan_n{n_dev}"] = {
            "tasks": tasks, "zoom_depth": len(zooms),
            "tasks_per_device": tasks // n_dev,
            "wall_s": round(dt, 3),
            "q_s_wall": round(tasks / dt, 1),
        }

    for path in ("grouped", "scan"):
        dev = float(np.max(np.abs(outs[(path, 1)] - outs[(path, 8)])))
        result["configs"][f"{path}_n8"]["max_abs_dev_vs_n1"] = dev
        assert dev < 1e-3, (path, dev)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
