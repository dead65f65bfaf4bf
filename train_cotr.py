"""Training entry point (reference train_cotr.py).

Reproduces the 3-stage recipe (reference readme.md:44-52):
  stage 1: frozen backbone, bs 24, 300k iters
  stage 2: --lr_backbone 1e-5, bs 16, 2M iters (resume from stage 1)
  stage 3: --enable_zoom yes --crop_cam no_crop, bs 16, 300k iters

Differences from the reference runtime: batches are built by a plain
iterator feeding a jitted data-parallel train step (no torch DataLoader);
checkpoints are Orbax; config drift is detected through params.json
(options_utils.py:62-86 semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def str2bool(v: str) -> bool:
    return str(v).lower() in ("yes", "true", "y", "1")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    # general (reference options.py:13-21)
    ap.add_argument("--confirm", type=str2bool, default=True)
    ap.add_argument("--use_cc", type=str2bool, default=False,
                    help="cluster mode: auto-resume from last checkpoint")
    # dataset (options.py:23-31)
    ap.add_argument("--dataset_config", default=None,
                    help="JSON file with scenes_name_list/valid_list/splits")
    ap.add_argument("--shuffle_data", type=str2bool, default=True)
    ap.add_argument("--use_ram", type=str2bool, default=False)
    ap.add_argument("--device_synth", type=str2bool, default=False,
                    help="synthesize supervision INSIDE the jitted train "
                         "step (data.device_synth): loader emits candidate "
                         "depth pixels + camera matrices instead of running "
                         "reprojection/occlusion on the host. Stage-1/2 "
                         "(crop_center_and_resize) only.")
    ap.add_argument("--crop_cam", default="crop_center_and_resize")
    ap.add_argument("--scene_file", default=None)
    # kNN (options.py:34-38)
    ap.add_argument("--pool_size", type=int, default=20)
    ap.add_argument("--k_size", type=int, default=1)
    # model (options.py:41-51)
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--hidden_dim", type=int, default=256)
    ap.add_argument("--dim_feedforward", type=int, default=None)
    ap.add_argument("--nheads", type=int, default=8)
    ap.add_argument("--layer", default="layer3")
    ap.add_argument("--enc_layers", type=int, default=6)
    ap.add_argument("--dec_layers", type=int, default=6)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--position_embedding", default="lin_sine")
    ap.add_argument("--dilation", type=str2bool, default=False)
    # training (train_cotr.py:90-116)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--lr_backbone", type=float, default=0.0)
    ap.add_argument("--batch_size", type=int, default=24)
    ap.add_argument("--max_iter", type=int, default=300_000)
    ap.add_argument("--valid_iter", type=int, default=1000)
    ap.add_argument("--num_kp", type=int, default=100)
    ap.add_argument("--kp_pool", type=int, default=100)
    ap.add_argument("--bidirectional", type=str2bool, default=True)
    ap.add_argument("--cycle_consis", type=str2bool, default=True)
    ap.add_argument("--need_rotation", type=str2bool, default=False)
    ap.add_argument("--max_rotation", type=float, default=0.0)
    ap.add_argument("--rotation_chance", type=float, default=0.0)
    ap.add_argument("--enable_zoom", type=str2bool, default=False)
    ap.add_argument("--zoom_start", type=float, default=1.0)
    ap.add_argument("--zoom_end", type=float, default=0.1)
    ap.add_argument("--zoom_levels", type=int, default=10)
    ap.add_argument("--zoom_jitter", type=float, default=0.5)
    ap.add_argument("--out_dir", default="out")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--resume", type=str2bool, default=False)
    ap.add_argument("--load_weights_path", default=None)
    ap.add_argument("--num_devices", type=int, default=None)
    ap.add_argument("--dtype", default="float32")
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

    from cotr_tpu import COTRConfig, TrainConfig, build_model
    from cotr_tpu.config import check_params_json, compact_name
    from cotr_tpu.data import (CotrDataset, CotrZoomDataset, DataConfig,
                               batch_iterator)
    from cotr_tpu.data.loader import PrefetchLoader
    from cotr_tpu.training import Trainer

    model_cfg = COTRConfig(
        backbone=args.backbone, layer=args.layer, hidden_dim=args.hidden_dim,
        nheads=args.nheads, enc_layers=args.enc_layers,
        dec_layers=args.dec_layers, dropout=args.dropout,
        dilation=args.dilation, position_embedding=args.position_embedding,
        dtype=args.dtype)
    train_cfg = TrainConfig(
        learning_rate=args.learning_rate, lr_backbone=args.lr_backbone,
        batch_size=args.batch_size, max_iter=args.max_iter,
        valid_iter=args.valid_iter, num_kp=args.num_kp,
        bidirectional=args.bidirectional, cycle_consis=args.cycle_consis,
        num_devices=args.num_devices, out_dir=args.out_dir,
        suffix=args.suffix)

    # interactive option confirmation before training (reference
    # options_utils.confirm_opt, options_utils.py:33-47): print every option
    # and gate on y/n, skipped under --confirm=no, cluster auto-resume
    # (use_cc) or a non-interactive stdin
    if args.confirm and not args.use_cc:
        from cotr_tpu.utils.misc import confirm, print_notification

        opts = sorted(vars(args).items())
        print_notification(
            [f"{k.rjust(25)}  {v}" for k, v in opts], "OPTIONS")
        if sys.stdin.isatty() and not confirm():
            sys.exit(1)

    run_name = compact_name(model_cfg, train_cfg)
    run_dir = os.path.join(args.out_dir, run_name)
    params_json = os.path.join(run_dir, "params.json")
    if os.path.exists(params_json) and not (args.resume or args.use_cc):
        if not check_params_json(params_json, model_cfg, train_cfg):
            print("ERROR: params.json mismatch with a previous run at "
                  f"{run_dir}; refusing to silently drift "
                  "(reference options_utils.py:62-86). Use --resume or a "
                  "--suffix.")
            sys.exit(1)

    assert args.dataset_config, "--dataset_config JSON is required"
    with open(args.dataset_config) as f:
        dcfg_raw = json.load(f)
    data_cfg = DataConfig(
        scenes_name_list=dcfg_raw["scenes_name_list"],
        valid_list_json=dcfg_raw["valid_list_json"],
        train_json=dcfg_raw["train_json"], val_json=dcfg_raw["val_json"],
        test_json=dcfg_raw.get("test_json", dcfg_raw["val_json"]),
        crop_cam=args.crop_cam, use_ram=args.use_ram,
        pool_size=args.pool_size, k_size=args.k_size, num_kp=args.num_kp,
        kp_pool=args.kp_pool, bidirectional=args.bidirectional,
        need_rotation=args.need_rotation, max_rotation=args.max_rotation,
        rotation_chance=args.rotation_chance, zoom_start=args.zoom_start,
        zoom_end=args.zoom_end, zoom_levels=args.zoom_levels,
        zoom_jitter=args.zoom_jitter)

    ds_cls = CotrZoomDataset if args.enable_zoom else CotrDataset
    ds_kw = {}
    if args.device_synth:
        assert not args.enable_zoom and \
            args.crop_cam == "crop_center_and_resize", \
            "--device_synth serves the stage-1/2 pre-cropped layout"
        ds_kw["device_synth"] = True
    train_ds = ds_cls(data_cfg, "train", seed=train_cfg.seed, **ds_kw)
    val_ds = ds_cls(data_cfg, "val", seed=train_cfg.seed + 100)
    print(f"train queries: {len(train_ds)}, val queries: {len(val_ds)}")

    model = build_model(model_cfg)
    workers = max(os.cpu_count() // 2, 2)
    trainer = Trainer(
        model, model_cfg, train_cfg,
        train_loader=PrefetchLoader(train_ds, args.batch_size,
                                    num_workers=workers, seed=train_cfg.seed),
        val_loader=PrefetchLoader(val_ds, args.batch_size, shuffle=False,
                                  num_workers=workers),
        out_dir=run_dir)

    sample = next(batch_iterator(train_ds, 2, seed=0))
    trainer.initialize(sample, seed=train_cfg.seed)

    if args.load_weights_path:
        if args.load_weights_path.endswith((".pth", ".tar")):
            from cotr_tpu.models.torch_convert import load_torch_checkpoint
            import jax.numpy as jnp
            from cotr_tpu.training.train_step import TrainState

            loaded = load_torch_checkpoint(args.load_weights_path, model_cfg)
            trainer.state = TrainState(
                trainer.state.step,
                jax.tree_util.tree_map(jnp.asarray, loaded),
                trainer.state.opt_state)
            print(f"loaded torch weights: {args.load_weights_path}")
        else:
            # npz release / Orbax dir / Trainer payload (cross-stage warm
            # start, reference --load_weights train_cotr.py:135-139); the
            # optimizer state starts fresh
            import jax.numpy as jnp
            from cotr_tpu.models.checkpoint_io import load_params
            from cotr_tpu.training.train_step import TrainState

            loaded = jax.tree_util.tree_map(
                jnp.asarray, load_params(args.load_weights_path, model_cfg))
            trainer.state = TrainState(
                trainer.state.step, loaded, trainer.state.opt_state)
            print(f"loaded weights: {args.load_weights_path}")

    resume = args.resume or args.use_cc
    trainer.train(resume=resume)


if __name__ == "__main__":
    main()
