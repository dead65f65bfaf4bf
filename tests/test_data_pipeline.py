"""End-to-end data pipeline on a synthetic COLMAP scene: ASCII parsing,
scene/kNN construction, supervision synthesis, batching, and a short
training run with checkpoint save/restore."""

import json
import os

import h5py
import numpy as np
import PIL.Image
import pytest

from cotr_tpu.data import (ColmapWithDepthAsciiReader, CotrDataset, DataConfig,
                           batch_iterator)


@pytest.fixture(scope="module")
def synthetic_scene(tmp_path_factory):
    """Two cameras viewing a textured plane at z=3, slight baseline."""
    root = tmp_path_factory.mktemp("megadepth")
    scene_dir = root / "0001" / "dense" / "sparse"
    img_dir = root / "0001" / "dense" / "imgs"
    depth_dir = root / "0001" / "dense" / "depths"
    dm_dir = root / "0001" / "dense" / "dist_mat"
    for d in (scene_dir, img_dir, depth_dir, dm_dir):
        d.mkdir(parents=True)

    rng = np.random.RandomState(0)
    h, w = 48, 64
    names = ["img_a.jpg", "img_b.jpg", "img_c.jpg"]
    for name in names:
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        PIL.Image.fromarray(img).save(img_dir / name)
        depth = np.full((h, w), 3.0, np.float32)
        with h5py.File(depth_dir / (os.path.splitext(name)[0] + ".h5"),
                       "w") as f:
            f.create_dataset("depth", data=depth)

    (scene_dir / "cameras.txt").write_text(
        "# Camera list with one line of data per camera:\n"
        "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n"
        "# Number of cameras: 1\n"
        f"1 PINHOLE {w} {h} 60.0 60.0 {w / 2} {h / 2}\n")

    # three poses: identity and small x-translations
    lines = [
        "# Image list with two lines of data per image:\n",
        "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n",
        "#   POINTS2D[] as (X, Y, POINT3D_ID)\n",
        "# Number of images: 3, mean observations per image: 0.0\n",
    ]
    # POINTS2D observations: point 1 seen by imgs 1+2, point 2 by 2+3,
    # point 3 by 1 only, point 4 by all three
    obs = {1: "10 10 1 20 20 3 30 30 4 5 5 -1",
           2: "11 11 1 21 21 2 31 31 4",
           3: "12 12 2 32 32 4"}
    for i, (name, tx) in enumerate(zip(names, [0.0, 0.15, -0.15])):
        lines.append(f"{i + 1} 1.0 0.0 0.0 0.0 {tx} 0.0 0.0 1 {name}\n")
        lines.append(obs[i + 1] + "\n")
    (scene_dir / "images.txt").write_text("".join(lines))

    pts_lines = [
        "# 3D point list with one line of data per point:\n",
        "#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[] as "
        "(IMAGE_ID, POINT2D_IDX)\n",
        "# Number of points: 4, mean track length: 2.0\n",
        "1 0.1 0.1 3.0 200 100 50 0.5 1 0 2 0\n",
        "2 0.2 0.2 3.0 200 100 50 0.5 2 1 3 0\n",
        "3 0.3 0.3 3.0 200 100 50 0.5 1 1\n",
        "4 0.4 0.4 3.0 200 100 50 0.5 1 2 2 2 3 1\n",
    ]
    (scene_dir / "points3D.txt").write_text("".join(pts_lines))

    rel = [f"0001/dense/imgs/{n}" for n in names]
    valid_json = root / "valid_list.json"
    valid_json.write_text(json.dumps(rel))
    train_json = root / "train.json"
    train_json.write_text(json.dumps(rel))
    val_json = root / "val.json"
    val_json.write_text(json.dumps(rel[:1]))

    dist = np.array([[1.0, 0.8, 0.7], [0.8, 1.0, 0.6], [0.7, 0.6, 1.0]],
                    np.float32)
    np.save(dm_dir / "dist_mat.npy", dist)

    return {
        "root": root,
        "cfg": DataConfig(
            scenes_name_list=[{
                "scene_dir": str(scene_dir),
                "image_dir": str(img_dir),
                "depth_dir": str(depth_dir),
            }],
            valid_list_json=str(valid_json),
            train_json=str(train_json),
            val_json=str(val_json),
            test_json=str(val_json),
            crop_cam="crop_center_and_resize",
            num_kp=10,
        ),
    }


def test_colmap_scene_parses(synthetic_scene):
    cfg = synthetic_scene["cfg"]
    sdd = cfg.scenes_name_list[0]
    scene = ColmapWithDepthAsciiReader.read_sfm_scene_given_valid_list_path(
        sdd["scene_dir"], sdd["image_dir"], sdd["depth_dir"],
        cfg.valid_list_json, "no_crop")
    assert len(scene) == 3
    cap = scene[0]
    assert cap.image.shape == (48, 64, 3)
    assert cap.depth_map.shape == (48, 64)
    assert (cap.depth_map == 3.0).all()


def test_dataset_sample_shapes_and_ranges(synthetic_scene):
    ds = CotrDataset(synthetic_scene["cfg"], "train", seed=0)
    assert len(ds) == 3
    sample = ds[0]
    assert sample["image"].shape == (256, 512, 3)
    assert sample["queries"].shape == (20, 2)  # bidirectional doubling
    assert sample["targets"].shape == (20, 2)
    q = sample["queries"]
    assert (q >= 0).all() and (q <= 1).all()
    # first half queries are in the left image, second half in the right
    assert (q[:10, 0] <= 0.5).all()
    assert (q[10:, 0] >= 0.5).all()


def test_batch_iterator_fixed_shapes(synthetic_scene):
    ds = CotrDataset(synthetic_scene["cfg"], "train", seed=1)
    batches = list(batch_iterator(ds, 2, seed=0))
    assert len(batches) == 1  # 3 samples, bs 2, drop_last
    b = batches[0]
    assert b["image"].shape == (2, 256, 512, 3)
    assert b["queries"].shape == (2, 20, 2)


@pytest.mark.slow
def test_trainer_short_run_and_checkpoint(synthetic_scene, tmp_path):
    import jax

    from cotr_tpu import COTRConfig, TrainConfig, build_model
    from cotr_tpu.training import Trainer

    model_cfg = COTRConfig(enc_layers=1, dec_layers=1)
    train_cfg = TrainConfig(batch_size=2, max_iter=2, valid_iter=2,
                            num_kp=10, learning_rate=1e-4)
    model = build_model(model_cfg)
    ds = CotrDataset(synthetic_scene["cfg"], "train", seed=2)
    trainer = Trainer(
        model, model_cfg, train_cfg,
        train_loader=lambda: batch_iterator(ds, 2, seed=0),
        val_loader=lambda: batch_iterator(ds, 2, shuffle=False, seed=0),
        out_dir=str(tmp_path / "run"), use_tensorboard=False)
    sample = next(batch_iterator(ds, 2, seed=0))
    trainer.initialize(sample)
    state = trainer.train()
    assert int(state.step) == 2
    assert os.path.exists(str(tmp_path / "run" / "checkpoints" / "checkpoint"))

    # restore into a fresh trainer
    trainer2 = Trainer(
        model, model_cfg, train_cfg,
        train_loader=lambda: batch_iterator(ds, 2, seed=0),
        out_dir=str(tmp_path / "run"), use_tensorboard=False)
    trainer2.initialize(sample)
    assert trainer2.load_checkpoint()
    assert int(trainer2.state.step) == 2
    a = jax.tree_util.tree_leaves(trainer.state.params)[0]
    b = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

def test_covisibility_lookup(synthetic_scene):
    """read_sfm_scene(covisibility=True) parses POINTS2D + points3D tracks;
    SfmScene.get_covisible_caps returns captures sharing >=1 3D point
    (reference sfm_scenes.py:60-72, colmap_helper.py:147-156)."""
    cfg = synthetic_scene["cfg"]
    sdd = cfg.scenes_name_list[0]
    scene = ColmapWithDepthAsciiReader.read_sfm_scene(
        sdd["scene_dir"], sdd["image_dir"], sdd["depth_dir"],
        "no_crop", covisibility=True)
    assert scene.point_meta is not None
    np.testing.assert_array_equal(scene.point_meta[4], [1, 2, 3])

    by_id = {cap.image_id: cap for cap in scene.captures}
    # img 1 observes points {1, 3, 4} -> covisible with imgs 1, 2, 3 (via 4)
    covis1 = sorted(c.image_id for c in scene.get_covisible_caps(by_id[1]))
    assert covis1 == [1, 2, 3]
    # img 3 observes {2, 4} -> point 2 links img 2, point 4 links all
    covis3 = sorted(c.image_id for c in scene.get_covisible_caps(by_id[3]))
    assert covis3 == [1, 2, 3]
    np.testing.assert_array_equal(by_id[1].point3d_id, [1, 3, 4])


def test_essential_matrix_epipolar_property():
    """CameraPose.essential_matrix (camera_pose.py:141-144) satisfies the
    epipolar constraint x2^T E x1 = 0 for rays of a world-identity first
    camera and this pose's camera."""
    from cotr_tpu.geometry.camera import CameraPose, Rotation, Translation
    from cotr_tpu.geometry.transforms import quaternion_from_matrix

    rng = np.random.RandomState(0)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    quat = quaternion_from_matrix(
        np.block([[q, np.zeros((3, 1))], [np.zeros((1, 3)), 1]]))
    t = rng.randn(3)
    pose = CameraPose(Translation(t.astype(np.float32)),
                      Rotation(np.asarray(quat, np.float32)))
    e_mat = pose.essential_matrix
    assert abs(np.linalg.norm(e_mat) - 1.0) < 1e-6
    c = pose.camera_center_in_world
    r = pose.world_to_camera[:3, :3]
    pts = rng.randn(20, 3) * 2
    x1 = pts
    x2 = (r @ (pts - c).T).T
    res = np.abs(np.einsum("ni,ij,nj->n", x2, e_mat, x1))
    assert res.max() < 1e-5, res.max()


@pytest.mark.slow
def test_eval_megadepth_pair_machinery(synthetic_scene):
    """evaluate_pair (eval_megadepth.py) end-to-end on the synthetic COLMAP
    scene with the identity stub engine: GT flow construction, dense query
    grid, engine run, EPE statistics — real-data-readiness smoke."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from eval_megadepth import evaluate_batch, prepare_pair
    from tests.test_engine_modes import IdentityRunner
    from cotr_tpu.data import DataConfig, MegadepthDataset
    from cotr_tpu.inference.engine import SparseEngine

    cfg = synthetic_scene["cfg"]
    data_cfg = DataConfig(
        scenes_name_list=cfg.scenes_name_list,
        valid_list_json=cfg.valid_list_json,
        train_json=cfg.train_json, val_json=cfg.val_json,
        test_json=cfg.test_json, crop_cam="no_crop")
    ds = MegadepthDataset(data_cfg, "val")
    assert ds.num_queries >= 1
    query_cap, nn_caps = ds.get_query_with_knn(0)
    engine = SparseEngine(IdentityRunner(), mode="stretching", task_bucket=8)
    p = prepare_pair(query_cap, nn_caps[0], grid=4)
    assert p is not None
    (epe,) = evaluate_batch(engine, [p], zoom_ins=[0.5])
    assert len(epe) > 0
    assert np.isfinite(epe).all()


@pytest.mark.slow
def test_bench_loader_tool_smoke(tmp_path):
    """tools/bench_loader.py end-to-end on a tiny scene (regression: a
    refactor once left _scene_config recursing into itself, so the tool
    could never report throughput)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_loader.py"),
         "--captures", "9", "--height", "96", "--width", "128",
         "--batch_size", "2", "--batches", "2", "--workers", "2",
         "--root", str(tmp_path / "scene")],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["batches_per_s"] > 0
    assert rec["captures"] == 9
