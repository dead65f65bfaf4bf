"""Training stack: loss semantics, optimizer masking, sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cotr_tpu import COTRConfig, TrainConfig, build_model
from cotr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cotr_tpu.training.loss import CYCLE_THRESH, masked_mse
from cotr_tpu.training.optim import param_labels
from cotr_tpu.training.train_step import (TrainState, create_train_state,
                                          make_train_step)


def test_masked_mse_matches_torch_semantics():
    import torch

    rng = np.random.RandomState(0)
    x = rng.randn(4, 10, 2).astype(np.float32)
    y = rng.randn(4, 10, 2).astype(np.float32)
    mask = rng.rand(4, 10) > 0.5
    ours = float(masked_mse(jnp.asarray((x - y) ** 2), jnp.asarray(mask)))
    theirs = float(torch.nn.functional.mse_loss(
        torch.from_numpy(x)[torch.from_numpy(mask)],
        torch.from_numpy(y)[torch.from_numpy(mask)]))
    assert abs(ours - theirs) < 1e-6


def test_masked_mse_empty_mask_is_zero():
    x = jnp.ones((2, 3, 2))
    assert float(masked_mse(x, jnp.zeros((2, 3), bool))) == 0.0


def test_param_labels_freeze_policy():
    cfg = COTRConfig(enc_layers=1, dec_layers=1)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 256, 512, 3)), jnp.zeros((1, 2, 2)))

    # lr_backbone = 0: whole backbone frozen, rest main
    labels = param_labels(params["params"], lr_backbone=0.0)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    for path, label in flat:
        names = [getattr(k, "key", str(k)) for k in path]
        if "backbone" in names:
            assert label == "frozen", names
        else:
            assert label == "main", names

    # lr_backbone > 0: layer2/3 conv weights train, stem + BN stay frozen
    labels = param_labels(params["params"], lr_backbone=1e-5)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    saw_backbone_trainable = False
    for path, label in flat:
        names = [getattr(k, "key", str(k)) for k in path]
        if "backbone" not in names:
            continue
        leaf = names[-1]
        is_bn = (leaf in ("running_mean", "running_var") or
                 (leaf in ("weight", "bias") and
                  (names[-2].startswith("bn") or names[-2].endswith("_bn"))))
        in_stage = any(n.startswith(("layer2", "layer3", "layer4"))
                       for n in names)
        if is_bn or not in_stage:
            assert label == "frozen", names
        else:
            assert label == "backbone", names
            saw_backbone_trainable = True
    assert saw_backbone_trainable


@pytest.mark.slow
def test_train_step_8dev_mesh_decreases_loss():
    """Full DP train step on the virtual 8-device CPU mesh: loss is finite,
    params update, a few steps reduce loss on a fixed batch."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    model_cfg = COTRConfig(enc_layers=1, dec_layers=1, dropout=0.0)
    train_cfg = TrainConfig(learning_rate=1e-4, batch_size=8)
    model = build_model(model_cfg)

    rng = np.random.RandomState(0)
    batch_np = {
        "image": rng.uniform(-1, 1, (8, 256, 512, 3)).astype(np.float32),
        "queries": rng.uniform(0.05, 0.45, (8, 4, 2)).astype(np.float32),
        "targets": rng.uniform(0.55, 0.95, (8, 4, 2)).astype(np.float32),
    }
    state, tx = create_train_state(model, train_cfg, jax.random.PRNGKey(0),
                                   {k: jnp.asarray(v)
                                    for k, v in batch_np.items()})
    state = TrainState(*replicate(tuple(state), mesh))
    step = make_train_step(model, tx, train_cfg, mesh)
    batch = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()},
                        mesh)

    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 3


@pytest.mark.slow
def test_checkpoint_io_loads_trainer_and_raw_layouts(tmp_path):
    """checkpoint_io.load_params must consume both a Trainer payload
    ({version, step, params, opt_state}) and a raw model.init tree — the
    round-1 gap was that demos could not load trainer checkpoints."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from cotr_tpu import build_model
    from cotr_tpu.models.checkpoint_io import load_params

    cfg = COTRConfig(enc_layers=1, dec_layers=1)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)),
                        jnp.zeros((1, 2, 2)))
    ckptr = ocp.StandardCheckpointer()

    raw_path = str(tmp_path / "raw")
    ckptr.save(raw_path, jax.tree_util.tree_map(np.asarray, params))
    trainer_path = str(tmp_path / "trainer")
    ckptr.save(trainer_path, {
        "version": np.asarray(2), "step": np.asarray(7),
        "params": jax.tree_util.tree_map(np.asarray, params["params"]),
        "opt_state": {"count": np.asarray(7)}})
    ckptr.wait_until_finished()

    for path in (raw_path, trainer_path):
        loaded = load_params(path, cfg)
        assert set(loaded) == {"params"}
        ref_leaves = jax.tree_util.tree_leaves(params)
        got_leaves = jax.tree_util.tree_leaves(loaded)
        assert len(ref_leaves) == len(got_leaves)
        for a, b in zip(ref_leaves, got_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cosine_lr_schedule_decays():
    """lr_schedule='cosine' must actually shrink update magnitudes over the
    decay horizon (and build/step without error)."""
    import jax
    import jax.numpy as jnp
    import optax

    from cotr_tpu.config import TrainConfig
    from cotr_tpu.training.optim import build_optimizer

    cfg = TrainConfig(learning_rate=1e-2, lr_schedule="cosine",
                      lr_decay_steps=10, lr_final_frac=0.01)
    params = {"transformer": {"w": jnp.ones((3,))}}
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    g = {"transformer": {"w": jnp.ones((3,))}}
    sizes = []
    for _ in range(10):
        upd, state = tx.update(g, state, params)
        sizes.append(float(jnp.abs(upd["transformer"]["w"]).max()))
    assert sizes[-1] < sizes[0] * 0.2, sizes  # decayed well below initial
