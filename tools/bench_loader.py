"""Measure MegaDepth-path input-pipeline throughput (VERDICT r2 item 7).

Generates a synthetic COLMAP scene ON DISK at production-like scale —
hundreds of captures, real JPEG images and .h5 depth maps — then drives
``PrefetchLoader`` + ``CotrDataset`` (the reference ``COTRDataset`` analog:
image+depth IO, 3D lift, occlusion-checked reprojection via the C++
``synth_corrs`` fast path, trim/flip/normalize) and reports batches/s and
samples/s against the device step rate (PERF.md §4).

  python tools/bench_loader.py --captures 500 --batches 20 --batch_size 24
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import numpy as np
import PIL.Image


def _scene_config(root, scene_dir, img_dir, depth_dir, use_ram):
    from cotr_tpu.data import DataConfig

    return DataConfig(
        scenes_name_list=[{
            "scene_dir": scene_dir,
            "image_dir": img_dir,
            "depth_dir": depth_dir,
        }],
        valid_list_json=os.path.join(root, "valid_list.json"),
        train_json=os.path.join(root, "train.json"),
        val_json=os.path.join(root, "val.json"),
        test_json=os.path.join(root, "val.json"),
        crop_cam="crop_center_and_resize",
        num_kp=100,
        use_ram=use_ram,
    )


def generate_scene(root: str, n_caps: int, h: int, w: int, seed: int = 0,
                   use_ram: bool = False, skip_files: bool = False,
                   scene_name: str = "0001", write_jsons: bool = True):
    """N cameras on a jittered grid viewing a textured slanted plane:
    every neighboring pair shares most of its frustum, so kNN sampling and
    reprojection produce dense valid correspondences like MegaDepth pairs.

    ``skip_files=True`` builds only the DataConfig (paths are deterministic)
    for a scene already on disk — file generation dominates setup on a
    1-core host, so ``--keep`` reuse must not rewrite anything."""
    rng = np.random.RandomState(seed)
    scene_dir = os.path.join(root, scene_name, "dense", "sparse")
    img_dir = os.path.join(root, scene_name, "dense", "imgs")
    depth_dir = os.path.join(root, scene_name, "dense", "depths")
    dm_dir = os.path.join(root, scene_name, "dense", "dist_mat")
    for d in (scene_dir, img_dir, depth_dir, dm_dir):
        os.makedirs(d, exist_ok=True)
    if skip_files:
        return _scene_config(root, scene_dir, img_dir, depth_dir, use_ram)

    # World-space procedural texture on a slanted plane z = z0 + a*Yw,
    # RENDERED through each capture's camera: image content obeys the scene
    # geometry, so reprojection supervision is learnable from pixels (the
    # round-4 generator pasted one shared pixel-space texture into every
    # capture — content did not move with the camera, making the targets
    # unlearnable noise; stage-2 training could only memorize).
    from cotr_tpu.data.synthetic import make_procedural_texture

    names = [f"img_{i:04d}.jpg" for i in range(n_caps)]
    z0 = 3.0
    a_slope = 0.1  # mild slant about the X axis -> depth varies per row
    f_len = 0.9 * w
    cx, cy = w / 2.0, h / 2.0
    side = int(np.ceil(np.sqrt(n_caps)))
    # camera grid (COLMAP T = -R C with R = I, so center C = -(tx, ty, 0));
    # positions drawn FIRST so rendering and images.txt share them
    ix = np.arange(n_caps)
    txs = 0.12 * (ix % side - side / 2) + rng.uniform(-0.02, 0.02, n_caps)
    tys = 0.12 * (ix // side - side / 2) + rng.uniform(-0.02, 0.02, n_caps)

    tex_size = 1024
    tex = make_procedural_texture(rng, size=tex_size).astype(np.float32)
    # world extent every camera's frustum (plus the grid span) fits into
    ext = (z0 + a_slope) / f_len * max(h, w) * 0.75 + 0.12 * side / 2 + 0.5

    xs = (np.arange(w, dtype=np.float64) - cx) / f_len          # (w,)
    ys = (np.arange(h, dtype=np.float64) - cy) / f_len          # (h,)
    for i, name in enumerate(names):
        cxw, cyw = -txs[i], -tys[i]
        # ray-plane intersection: t = (z0 + a*cyw) / (1 - a*(y-cy)/f)
        t = (z0 + a_slope * cyw) / (1.0 - a_slope * ys)[:, None]  # (h, 1)
        t = np.broadcast_to(t, (h, w))
        xw = cxw + t * xs[None, :]
        yw = cyw + t * ys[:, None]
        u = (xw + ext) / (2 * ext) * (tex_size - 1)
        v = (yw + ext) / (2 * ext) * (tex_size - 1)
        u0 = np.clip(np.floor(u).astype(int), 0, tex_size - 2)
        v0 = np.clip(np.floor(v).astype(int), 0, tex_size - 2)
        fu = np.clip(u - u0, 0, 1)[..., None]
        fv = np.clip(v - v0, 0, 1)[..., None]
        img = (tex[v0, u0] * (1 - fu) * (1 - fv) +
               tex[v0, u0 + 1] * fu * (1 - fv) +
               tex[v0 + 1, u0] * (1 - fu) * fv +
               tex[v0 + 1, u0 + 1] * fu * fv)
        # mild per-capture photometric variation + sensor noise (does not
        # move content, trains photometric robustness)
        img = img * rng.uniform(0.9, 1.1, (1, 1, 3)) + rng.uniform(-8, 8)
        img = np.clip(img + rng.randint(-6, 6, (h, w, 3)), 0,
                      255).astype(np.uint8)
        PIL.Image.fromarray(img).save(os.path.join(img_dir, name),
                                      quality=92)
        with h5py.File(os.path.join(
                depth_dir, os.path.splitext(name)[0] + ".h5"), "w") as f:
            f.create_dataset("depth", data=t.astype(np.float32))

    with open(os.path.join(scene_dir, "cameras.txt"), "w") as f:
        f.write("# Camera list with one line of data per camera:\n"
                "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n"
                "# Number of cameras: 1\n"
                f"1 PINHOLE {w} {h} {f_len} {f_len} {w / 2} {h / 2}\n")

    lines = [
        "# Image list with two lines of data per image:\n",
        "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n",
        "#   POINTS2D[] as (X, Y, POINT3D_ID)\n",
        f"# Number of images: {n_caps}, mean observations per image: 1.0\n",
    ]
    for i, name in enumerate(names):
        # the exact positions the captures were rendered from (full float
        # precision: a 1e-4 pose truncation is a multi-pixel reprojection
        # error at f ~ 0.9w)
        lines.append(f"{i + 1} 1.0 0.0 0.0 0.0 {txs[i]:.10f} "
                     f"{tys[i]:.10f} 0.0 1 {name}\n")
        lines.append(f"10 10 1\n")  # every capture observes point 1
    with open(os.path.join(scene_dir, "images.txt"), "w") as f:
        f.write("".join(lines))

    track = " ".join(f"{i + 1} 0" for i in range(n_caps))
    with open(os.path.join(scene_dir, "points3D.txt"), "w") as f:
        f.write("# 3D point list with one line of data per point:\n"
                "#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[] as "
                "(IMAGE_ID, POINT2D_IDX)\n"
                "# Number of points: 1, mean track length: 1.0\n"
                f"1 0.0 0.0 {z0} 200 100 50 0.5 {track}\n")

    rel = [f"{scene_name}/dense/imgs/{n}" for n in names]
    if write_jsons:
        with open(os.path.join(root, "valid_list.json"), "w") as f:
            json.dump(rel, f)
        with open(os.path.join(root, "train.json"), "w") as f:
            json.dump(rel, f)
        with open(os.path.join(root, "val.json"), "w") as f:
            json.dump(rel[:2], f)

    # overlap matrix from grid distance (neighbors overlap most)
    ix = np.arange(n_caps)
    gx, gy = ix % side, ix // side
    d2 = (gx[:, None] - gx[None]) ** 2 + (gy[:, None] - gy[None]) ** 2
    dist = np.exp(-0.5 * d2).astype(np.float32)
    np.save(os.path.join(dm_dir, "dist_mat.npy"), dist)

    return _scene_config(root, scene_dir, img_dir, depth_dir, use_ram)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--captures", type=int, default=500)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--batch_size", type=int, default=24)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--root", default="/tmp/bench_loader_scene")
    ap.add_argument("--device_synth", action="store_true",
                    help="emit the device-synth layout (candidates + camera "
                         "matrices; reprojection/occlusion happen in the "
                         "jitted step) instead of host supervision")
    ap.add_argument("--use_ram", action="store_true",
                    help="preload images/depths to RAM (reference "
                         "--use_ram; the loader fix for IO-bound sampling)")
    ap.add_argument("--keep", action="store_true",
                    help="reuse/keep the generated scene directory")
    args = ap.parse_args()

    from cotr_tpu.data import CotrDataset
    from cotr_tpu.data.loader import PrefetchLoader

    if not args.keep and os.path.isdir(args.root):
        shutil.rmtree(args.root)
    marker = os.path.join(args.root, "train.json")
    t0 = time.time()
    if not os.path.exists(marker):
        cfg = generate_scene(args.root, args.captures, args.height,
                             args.width, use_ram=args.use_ram)
        print(f"scene generated: {args.captures} captures "
              f"{args.height}x{args.width} in {time.time() - t0:.1f}s")
    else:
        cfg = generate_scene(args.root, args.captures, args.height,
                             args.width, use_ram=args.use_ram,
                             skip_files=True)
    t0 = time.time()
    ds = CotrDataset(cfg, "train", seed=0,
                     device_synth=args.device_synth)
    print(f"dataset built: {len(ds)} samples in {time.time() - t0:.1f}s")

    loader = PrefetchLoader(ds, args.batch_size, num_workers=args.workers,
                            seed=0)

    def cycle():
        while True:
            for b in loader:
                yield b

    it = cycle()
    # warm: scene caches, first IO
    next(it)
    t0 = time.time()
    n = 0
    for _ in range(args.batches):
        batch = next(it)
        n += 1
    dt = time.time() - t0
    bps = n / dt
    result = {
        "metric": "megadepth-path loader throughput",
        "captures": args.captures,
        "image_hw": [args.height, args.width],
        "batch_size": args.batch_size,
        "use_ram": args.use_ram,
        "batches_timed": n,
        "batches_per_s": round(bps, 3),
        "samples_per_s": round(bps * args.batch_size, 1),
        "device_steps_per_s_stage1": 8.6,  # PERF.md §4 reference point
        "keys": sorted(batch.keys()),
    }
    result["device_synth"] = args.device_synth
    print(json.dumps(result))


if __name__ == "__main__":
    main()
