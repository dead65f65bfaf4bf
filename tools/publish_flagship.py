"""Publish a trained checkpoint as the committed flagship weights.

Converts a Trainer/orbax checkpoint into the repo's committable `.npz`
release format (bf16 bit patterns, `models/checkpoint_io.save_params_npz`)
at ``checkpoints/flagship.npz`` plus a provenance JSON next to it.

  python tools/publish_flagship.py --ckpt out/synthetic_run/checkpoints/checkpoint \
      --eval_json /tmp/eval_78k/metrics.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--eval_json", action="append", default=None,
                    help="eval_synthetic_pair metrics to embed as "
                         "provenance (repeatable: one per held-out eval "
                         "texture, keyed by image name)")
    ap.add_argument("--out", default="checkpoints/flagship.npz")
    ap.add_argument("--note", default=None,
                    help="free-text provenance note (training history, "
                         "warm-start lineage) embedded in the JSON")
    args = ap.parse_args()

    # format conversion only — no device compute; pin jax to CPU via the
    # LIVE config (sitecustomize imports jax before env vars can act, and
    # initializing the axon backend hangs when the tunnel is down)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cotr_tpu.models.checkpoint_io import load_params, save_params_npz

    params = load_params(args.ckpt, None)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_npz(params, args.out)
    size_mb = os.path.getsize(args.out) / 1e6

    meta = {"source": os.path.abspath(args.ckpt), "format": "npz-bf16",
            "size_mb": round(size_mb, 1)}

    # embed the run's training config + step so the README's provenance
    # claims are verifiable from the committed artifact alone (ADVICE r4):
    # params.json lives two levels above .../checkpoints/<name>
    run_dir = os.path.dirname(os.path.dirname(os.path.abspath(args.ckpt)))
    params_json = os.path.join(run_dir, "params.json")
    if os.path.exists(params_json):
        with open(params_json) as f:
            meta["training"] = json.load(f)
    try:
        from cotr_tpu.data.synthetic import SyntheticHomographyDataset
        meta["eval_textures_excluded_from_training"] = list(
            SyntheticHomographyDataset.EVAL_TEXTURES)
    except Exception:
        pass
    if args.note:
        meta["note"] = args.note
    evals = {}
    for pth in (args.eval_json or []):
        if os.path.exists(pth):
            with open(pth) as f:
                e = json.load(f)
            evals[e.get("image", os.path.basename(pth))] = e
    if len(evals) == 1:
        meta["eval"] = next(iter(evals.values()))
    elif evals:
        meta["eval"] = evals
    with open(os.path.splitext(args.out)[0] + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))
    print(f"wrote {args.out} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
