"""Device-side MegaDepth supervision (data.device_synth): the correspondences
synthesized inside the jitted step must agree with the host projective math
(compute_corrs semantics), and the train step must run on the new layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_data_pipeline import synthetic_scene  # noqa: F401 (fixture)


def test_depth_quantization_roundtrip():
    from cotr_tpu.data.device_synth import (dequantize_depth_jnp,
                                            quantize_depth)

    rng = np.random.RandomState(0)
    depth = rng.uniform(0, 800.0, (32, 32)).astype(np.float32)
    depth[rng.uniform(size=depth.shape) < 0.3] = 0.0
    q, scale = quantize_depth(depth)
    back = np.asarray(dequantize_depth_jnp(jnp.asarray(q),
                                           jnp.asarray(scale)))
    # absolute error far inside the 0.5 occlusion threshold
    assert np.abs(back - depth).max() < 0.05, np.abs(back - depth).max()


def test_device_synth_sample_layout(synthetic_scene):  # noqa: F811
    from cotr_tpu.data.dataset import CotrDataset

    ds = CotrDataset(synthetic_scene["cfg"], "train", seed=0,
                     device_synth=True)
    s = ds[0]
    num_kp = synthetic_scene["cfg"].num_kp
    assert s["image"].shape == (256, 512, 3) and s["image"].dtype == np.uint8
    assert s["cand"].shape == (6 * num_kp, 3)
    assert s["qdepth"].shape == (256, 256) and s["qdepth"].dtype == np.uint16
    assert s["kinv_nn"].shape == (3, 3)
    assert s["c2w_nn"].shape == (3, 4)
    assert s["proj_q"].shape == (3, 4)


def test_device_synth_matches_host_projection(synthetic_scene):  # noqa: F811
    """Every weight-1 device correspondence must equal the host numpy
    reprojection of the same neighbor pixel (pcd_2d_to_pcd_3d ->
    pcd_3d_to_pcd_2d, the compute_corrs path)."""
    from cotr_tpu.data.dataset import CotrDataset
    from cotr_tpu.data.device_synth import synth_supervision_batch
    from cotr_tpu.geometry.projector import (pcd_2d_to_pcd_3d,
                                             pcd_3d_to_pcd_2d)
    from cotr_tpu.utils.constants import MAX_SIZE

    cfg = synthetic_scene["cfg"]
    num_kp = cfg.num_kp
    ds = CotrDataset(cfg, "train", seed=3, device_synth=True)
    samples = [ds[i] for i in range(2)]
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    canvas, queries, targets, weights = jax.jit(
        lambda b: synth_supervision_batch(b, num_kp, True))(jbatch)
    canvas = np.asarray(canvas)
    queries = np.asarray(queries)
    targets = np.asarray(targets)
    weights = np.asarray(weights)
    assert queries.shape == (2, 2 * num_kp, 2)
    assert weights.shape == (2, 2 * num_kp)
    # the fixture's flat-depth overlapping cameras give mostly valid picks
    assert weights.mean() > 0.5, weights.mean()

    for bi, s in enumerate(samples):
        # denormalize the first num_kp (query->nn direction)
        q_xy = queries[bi, :num_kp] * [2 * MAX_SIZE, MAX_SIZE]
        nn_xy = targets[bi, :num_kp] * [2 * MAX_SIZE, MAX_SIZE] \
            - [MAX_SIZE, 0]
        if s["flip"] > 0.5:  # undo the mirror
            q_xy[:, 0] = MAX_SIZE - 1 - q_xy[:, 0]
            nn_xy[:, 0] = MAX_SIZE - 1 - nn_xy[:, 0]
        w = weights[bi, :num_kp]
        # nn_xy are (pre-flip) integer candidate pixels: look up their depth
        # in the emitted candidate list and reproject on the host
        cand = s["cand"]
        for j in np.where(w > 0)[0][:20]:
            match = np.where((np.abs(cand[:, 0] - nn_xy[j, 0]) < 1e-3) &
                             (np.abs(cand[:, 1] - nn_xy[j, 1]) < 1e-3))[0]
            assert match.size, (bi, j, nn_xy[j])
            z = cand[match[0], 2]
            kinv = s["kinv_nn"].astype(np.float64)
            world, _ = pcd_2d_to_pcd_3d(
                nn_xy[j][None], np.array([[z]], np.float64),
                np.linalg.inv(kinv),
                motion=np.vstack([s["c2w_nn"].astype(np.float64),
                                  [0, 0, 0, 1]]),
                return_index=True)
            # project with proj_q = K_q @ w2c[:3] (already composed)
            uvw = s["proj_q"].astype(np.float64) @ np.append(world[0], 1.0)
            expect = uvw[:2] / uvw[2]
            np.testing.assert_allclose(q_xy[j], expect, atol=0.1,
                                       err_msg=f"sample {bi} corr {j}")

    # flip plumbing: flipped samples' canvases have mirrored halves
    for bi, s in enumerate(samples):
        if s["flip"] > 0.5:
            orig = s["image"]
            np.testing.assert_array_equal(canvas[bi][:, :MAX_SIZE],
                                          orig[:, :MAX_SIZE][:, ::-1])
            np.testing.assert_array_equal(canvas[bi][:, MAX_SIZE:],
                                          orig[:, MAX_SIZE:][:, ::-1])
        else:
            np.testing.assert_array_equal(canvas[bi], s["image"])


@pytest.mark.slow
def test_train_step_accepts_device_synth_layout(synthetic_scene):  # noqa: F811
    from cotr_tpu import COTRConfig, TrainConfig, build_model
    from cotr_tpu.data.dataset import CotrDataset
    from cotr_tpu.training.train_step import (create_train_state,
                                              make_train_step)

    cfg = synthetic_scene["cfg"]
    ds = CotrDataset(cfg, "train", seed=1, device_synth=True)
    samples = [ds[i % len(ds)] for i in range(2)]
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = build_model(COTRConfig(enc_layers=1, dec_layers=1, dropout=0.0))
    tcfg = TrainConfig(batch_size=2, num_kp=cfg.num_kp)
    state, tx = create_train_state(model, tcfg, jax.random.PRNGKey(0),
                                   jbatch)
    step = make_train_step(model, tx, tcfg)
    state, metrics = step(state, jbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # the trainer's TB histograms read the synthesized targets from the
    # step's metrics (the batch itself carries no host 'targets')
    assert metrics["target"].shape == metrics["pred"].shape


@pytest.mark.slow
def test_trainer_tb_loop_on_device_synth_layout(synthetic_scene, tmp_path):  # noqa: F811
    """Regression: the train-loop TB branch and validate() must not read
    batch['targets'] on the device-synth layout (it has none)."""
    from cotr_tpu import COTRConfig, TrainConfig, build_model
    from cotr_tpu.data.dataset import CotrDataset, batch_iterator
    from cotr_tpu.training import Trainer

    class RecordingTB:
        def __init__(self):
            self.calls = []

        def add_scalar(self, tag, *a, **kw):
            self.calls.append(("scalar", tag))

        def add_histogram(self, tag, *a, **kw):
            self.calls.append(("histogram", tag))

        def add_image(self, tag, *a, **kw):
            self.calls.append(("image", tag))

    model_cfg = COTRConfig(enc_layers=1, dec_layers=1)
    train_cfg = TrainConfig(batch_size=2, max_iter=1, valid_iter=1,
                            tb_iter=1, num_kp=synthetic_scene["cfg"].num_kp,
                            learning_rate=1e-4)
    model = build_model(model_cfg)
    ds = CotrDataset(synthetic_scene["cfg"], "train", seed=4,
                     device_synth=True)
    trainer = Trainer(
        model, model_cfg, train_cfg,
        train_loader=lambda: batch_iterator(ds, 2, seed=0),
        val_loader=lambda: batch_iterator(ds, 2, shuffle=False, seed=0),
        out_dir=str(tmp_path / "run"), use_tensorboard=False)
    trainer._tb = RecordingTB()
    trainer.initialize(next(batch_iterator(ds, 2, seed=0)))
    state = trainer.train()
    assert int(state.step) == 1
    tags = {c[1] for c in trainer._tb.calls}
    assert "distribution/target" in tags and "loss/val" in tags


def test_weighted_loss_ignores_invalid_queries():
    """weights=0 rows must not influence the loss (the device-synth
    analog of the reference's sample re-draw)."""
    from cotr_tpu.training.loss import cotr_loss

    class Stub:
        def apply(self, params, canvas, q, **kw):
            return q * 0.5

    canvas = jnp.zeros((1, 4, 8, 3))
    q = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (1, 6, 2)),
                    jnp.float32)
    t = q * 0.5  # perfect prediction on all rows
    t_bad = t.at[0, 3:].set(99.0)  # poison rows 3..5
    w_good = jnp.asarray([[1, 1, 1, 0, 0, 0]], jnp.float32)
    loss_clean, _ = cotr_loss(Stub(), {}, canvas, q, t,
                              cycle_consis=False, weights=None)
    loss_masked, _ = cotr_loss(Stub(), {}, canvas, q, t_bad,
                               cycle_consis=False, weights=w_good)
    assert float(loss_clean) < 1e-8
    assert float(loss_masked) < 1e-8  # poison rows carried weight 0
