"""Pin down the guided-matching headline noise (VERDICT r4 weak #5).

The guided-matching speedup vs the reference's 79 s drifted 17.2x (r2) ->
14.9x (r3) -> 10.0x (r4). Hypothesis: the chip is time-shared and the
drift is tenant contention, not an engine regression. This tool collects
the evidence in ONE process by interleaving, for N rounds:

  1. a device-only matmul probe (chained in-jit dependency chain,
     utils/profiling.chained_op_time) — pure device throughput, no host
     or engine code on the timeline;
  2. the EXACT bench guided job (both directions, 4 zoom levels, 2048
     DISK kpts each, multipair batched engine);
  3. the same job through the serial single-pair engine path (the r2-era
     invocation pattern — one cotr_corr_multiscale per direction).

If guided wall correlates with probe time across rounds, the drift is the
chip, not the code; the committed artifact reports the correlation and the
medians + IQRs. Writes out/triage_guided.json; PERF.md cites it.

  python tools/triage_guided.py --rounds 8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--ckpt", default="checkpoints/flagship.npz")
    ap.add_argument("--out", default="out/triage_guided.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np
    import PIL.Image

    from cotr_tpu import COTRConfig, build_model
    from cotr_tpu.inference.engine import FasterSparseEngine
    from cotr_tpu.inference.runner import ModelRunner
    from cotr_tpu.models.checkpoint_io import load_params
    from cotr_tpu.utils.profiling import chained_op_time

    cfg = COTRConfig(dtype=args.dtype, use_flash_attention=True)
    model = build_model(cfg)
    params = load_params(args.ckpt, cfg)
    runner = ModelRunner(model, params)
    engine = FasterSparseEngine(runner, mode="tile")

    sample = "/root/reference/sample_data"
    g_a = np.array(PIL.Image.open(
        f"{sample}/imgs/21526113_4379776807.jpg").convert("RGB"))
    g_b = np.array(PIL.Image.open(
        f"{sample}/imgs/21126421_4537535153.jpg").convert("RGB"))
    kp_a = np.load(f"{sample}/21526113_4379776807.jpg.disk.kpts.npy")
    kp_b = np.load(f"{sample}/21126421_4537535153.jpg.disk.kpts.npy")
    zoom4 = list(np.linspace(0.5, 0.0625, 4))

    def guided_multipair():
        engine.cotr_corr_multiscale_multipair(
            [(g_a, g_b), (g_b, g_a)], zoom_ins=zoom4, converge_iters=1,
            max_corrs=[kp_a.shape[0], kp_b.shape[0]],
            queries_list=[kp_a.astype(np.float64),
                          kp_b.astype(np.float64)], force=True)

    def guided_serial():
        engine.cotr_corr_multiscale(
            g_a, g_b, zoom_ins=zoom4, converge_iters=1,
            max_corrs=kp_a.shape[0], queries_a=kp_a.astype(np.float64),
            force=True)
        engine.cotr_corr_multiscale(
            g_b, g_a, zoom_ins=zoom4, converge_iters=1,
            max_corrs=kp_b.shape[0], queries_a=kp_b.astype(np.float64),
            force=True)

    # probe: a bf16 1024^3 matmul consuming the chain scalar — ~2.1 GFLOP
    # per call, long enough to see tenant contention, short enough to
    # sample every round
    m = jnp.ones((1024, 1024), jnp.bfloat16)

    def probe_fn(acc, m):
        return (m @ (m * (1.0 + acc * 0.0))).sum().astype(jnp.float32)

    def probe_ms():
        return chained_op_time(probe_fn, m, iters=30)

    probe_ms()          # warm probe compiles
    guided_multipair()  # warm all engine buckets
    guided_serial()

    rounds = []
    for r in range(args.rounds):
        p0 = probe_ms()
        t0 = time.time()
        guided_multipair()
        mp_wall = time.time() - t0
        p1 = probe_ms()
        t0 = time.time()
        guided_serial()
        ser_wall = time.time() - t0
        p2 = probe_ms()
        rounds.append({"probe_ms": [round(p, 3) for p in (p0, p1, p2)],
                       "multipair_wall_s": round(mp_wall, 3),
                       "serial_wall_s": round(ser_wall, 3)})
        print(json.dumps(rounds[-1]), flush=True)

    mp = np.array([r["multipair_wall_s"] for r in rounds])
    ser = np.array([r["serial_wall_s"] for r in rounds])
    pr = np.array([np.mean(r["probe_ms"]) for r in rounds])

    def stats(v):
        s = np.sort(v)
        n = len(s)
        return {"median": round(float(s[n // 2]), 3),
                "iqr": [round(float(s[n // 4]), 3),
                        round(float(s[(3 * n) // 4]), 3)],
                "min": round(float(s[0]), 3), "max": round(float(s[-1]), 3)}

    def corr(a, b):
        if len(a) < 3 or a.std() == 0 or b.std() == 0:
            return None
        return round(float(np.corrcoef(a, b)[0, 1]), 3)

    summary = {
        "rounds": rounds,
        "probe_ms": stats(pr),
        "multipair": {**stats(mp),
                      "speedup_vs_ref_79s": {
                          "median": round(79.0 / float(np.median(mp)), 2),
                          "at_min_wall": round(79.0 / float(mp.min()), 2),
                          "at_max_wall": round(79.0 / float(mp.max()), 2)}},
        "serial": stats(ser),
        "corr_probe_vs_multipair": corr(pr, mp),
        "corr_probe_vs_serial": corr(pr, ser),
        "reading": ("probe-vs-wall correlation >~0.6 with a wide probe "
                    "spread attributes the round-to-round headline drift "
                    "to chip time-sharing; near-zero correlation with a "
                    "tight probe spread would indicate a real engine-side "
                    "regression instead"),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("probe_ms", "multipair", "serial",
                       "corr_probe_vs_multipair")}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
