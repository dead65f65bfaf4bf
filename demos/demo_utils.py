"""Shared demo plumbing: model/engine construction, weight loading,
visualization. Mirrors the reference demos' common setup (build_model +
safe_load_weights + SparseEngine; e.g. demo_single_pair.py:25-37)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SAMPLE_DIR = "/root/reference/sample_data"

#: the committed flagship weights: demos default to them when present
#: (reference demos default to the released checkpoint path,
#: e.g. demo_single_pair.py:51 "--load_weights default.pth.tar")
FLAGSHIP = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "checkpoints", "flagship.npz")


def add_common_args(ap: argparse.ArgumentParser):
    ap.add_argument("--load_weights_path",
                    default=FLAGSHIP if os.path.exists(FLAGSHIP) else None,
                    help="torch .pth(.tar), npz release or orbax checkpoint "
                         "to load (default: the committed flagship weights "
                         "when present; pass 'none' for random init)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--max_corrs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--faster_infer", default="no", choices=["yes", "no"])
    ap.add_argument("--safe_area", type=float, default=0.5,
                    help="grouped-engine membership window fraction "
                         "(0.5 = exact reference semantics; larger = more "
                         "grouping, slightly lower edge accuracy)")
    ap.add_argument("--out", default=None, help="output image path")


def build_engine(args, mode="tile"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cotr_tpu import COTRConfig, build_model
    from cotr_tpu.inference import ModelRunner, SparseEngine
    from cotr_tpu.inference.engine import FasterSparseEngine

    # fused Pallas attention: big VMEM/HBM win at inference;
    # auto-falls-back off-TPU or under dropout
    cfg = COTRConfig(dtype=args.dtype, use_flash_attention=True)
    model = build_model(cfg)
    if args.load_weights_path and args.load_weights_path.lower() != "none":
        # torch release file, Trainer payload, or raw orbax init tree
        from cotr_tpu.models.checkpoint_io import load_params
        params = load_params(args.load_weights_path, cfg)
        print(f"loaded weights from {args.load_weights_path}")
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 256, 512, 3)),
                                     jnp.zeros((1, 2, 2)))
        print("WARNING: no weights given; using random initialization")
    runner = ModelRunner(model, params)
    if args.faster_infer == "yes":
        return FasterSparseEngine(runner, batch_size=args.batch_size,
                                  mode=mode,
                                  safe_area=getattr(args, "safe_area", 0.5))
    return SparseEngine(runner, batch_size=args.batch_size, mode=mode)


def load_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    return imageio.imread(path, pilmode="RGB")


def save_corr_visualization(img_a, img_b, corrs, out_path, lines=True):
    """Side-by-side pair with correspondence lines (matplotlib, headless)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    h = max(img_a.shape[0], img_b.shape[0])
    w = img_a.shape[1] + img_b.shape[1]
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[:img_a.shape[0], :img_a.shape[1]] = img_a
    canvas[:img_b.shape[0], img_a.shape[1]:] = img_b
    fig, ax = plt.subplots(figsize=(12, 6))
    ax.imshow(canvas)
    if lines and len(corrs):
        xs = np.stack([corrs[:, 0], corrs[:, 2] + img_a.shape[1]])
        ys = np.stack([corrs[:, 1], corrs[:, 3]])
        ax.plot(xs, ys, linewidth=0.5, color="lime", alpha=0.7)
        ax.scatter(xs.ravel(), ys.ravel(), s=2, color="red")
    ax.set_axis_off()
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    print(f"wrote {out_path}")
