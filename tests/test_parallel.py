"""Parallelism: DP vs DP+TP equivalence on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cotr_tpu import COTRConfig, TrainConfig, build_model
from cotr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cotr_tpu.parallel.opt_shard import opt_state_shardings, shard_opt_state
from cotr_tpu.parallel.tp import make_2d_mesh, transformer_param_shardings
from cotr_tpu.training.train_step import (TrainState, create_train_state,
                                          make_train_step)


@pytest.mark.slow
def test_tp_matches_dp_loss():
    """One train step under pure DP and under DP x TP must agree."""
    assert len(jax.devices()) >= 8
    model_cfg = COTRConfig(enc_layers=1, dec_layers=1, dropout=0.0)
    train_cfg = TrainConfig(batch_size=8)
    model = build_model(model_cfg)
    rng = np.random.RandomState(0)
    batch_np = {
        "image": rng.uniform(-1, 1, (8, 256, 512, 3)).astype(np.float32),
        "queries": rng.uniform(0.05, 0.45, (8, 4, 2)).astype(np.float32),
        "targets": rng.uniform(0.55, 0.95, (8, 4, 2)).astype(np.float32),
    }
    jbatch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    losses = {}
    params_after = {}
    for layout in ("dp", "tp"):
        state, tx = create_train_state(model, train_cfg,
                                       jax.random.PRNGKey(0), jbatch)
        if layout == "dp":
            mesh = make_mesh(8)
            state = TrainState(*replicate(tuple(state), mesh))
        else:
            mesh = make_2d_mesh(8, model_parallel=2)
            shardings = {"params": transformer_param_shardings(
                state.params["params"], mesh)}
            params = jax.device_put(state.params, shardings)
            # Adam moments follow params (TP) + ZeRO-1 over 'data' for the
            # replicated ones — must not change the math
            opt = shard_opt_state(state.opt_state, state.params["params"],
                                  shardings["params"], mesh,
                                  zero1_axis="data")
            (step_v,) = replicate((state.step,), mesh)
            state = TrainState(step_v, params, opt)
        step = make_train_step(model, tx, train_cfg, mesh)
        sharded = shard_batch(jbatch, mesh)
        state, metrics = step(state, sharded, jax.random.PRNGKey(1))
        losses[layout] = float(metrics["loss"])
        params_after[layout] = np.asarray(
            jax.tree_util.tree_leaves(state.params)[0])

    assert np.isfinite(losses["dp"])
    assert abs(losses["dp"] - losses["tp"]) < 1e-5, losses
    np.testing.assert_allclose(params_after["dp"], params_after["tp"],
                               atol=1e-5)


def test_tp_sharding_specs():
    from jax.sharding import PartitionSpec as P

    model_cfg = COTRConfig(enc_layers=1, dec_layers=1)
    model = build_model(model_cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)),
                        jnp.zeros((1, 2, 2)))
    mesh = make_2d_mesh(8, model_parallel=2)
    sh = transformer_param_shardings(params["params"], mesh)
    tr = sh["transformer"]["enc0"]
    assert tr["self_attn"]["q_proj"]["kernel"].spec == P(None, "model")
    assert tr["self_attn"]["out_proj"]["kernel"].spec == P("model", None)
    assert tr["ffn"]["linear1"]["kernel"].spec == P(None, "model")
    assert tr["ffn"]["linear2"]["kernel"].spec == P("model", None)
    assert tr["norm1"]["scale"].spec == P()
    assert sh["backbone"]["body"]["conv1"]["kernel"].spec == P()


def test_opt_state_shardings_follow_params():
    """Adam mu/nu inherit each parameter's TP sharding; with ZeRO-1, moments
    of replicated params shard their largest divisible dim over 'data';
    scalars (counts) stay replicated."""
    from jax.sharding import PartitionSpec as P

    from cotr_tpu.training.train_step import create_train_state

    model_cfg = COTRConfig(enc_layers=1, dec_layers=1, dropout=0.0)
    train_cfg = TrainConfig(batch_size=8)
    model = build_model(model_cfg)
    rng = np.random.RandomState(0)
    jbatch = {
        "image": jnp.zeros((8, 256, 512, 3), jnp.float32),
        "queries": jnp.asarray(
            rng.uniform(0.05, 0.45, (8, 4, 2)).astype(np.float32)),
        "targets": jnp.asarray(
            rng.uniform(0.55, 0.95, (8, 4, 2)).astype(np.float32)),
    }
    state, _ = create_train_state(model, train_cfg, jax.random.PRNGKey(0),
                                  jbatch)
    mesh = make_2d_mesh(8, model_parallel=2)
    psh = transformer_param_shardings(state.params["params"], mesh)
    osh = opt_state_shardings(state.opt_state, state.params["params"], psh,
                              mesh, zero1_axis="data")

    from cotr_tpu.parallel.opt_shard import _names

    found = {"tp_kernel": 0, "zero1": 0, "scalar": 0}
    flat = jax.tree_util.tree_leaves_with_path(osh)
    for path, sh in flat:
        names = list(_names(path))
        spec = tuple(sh.spec)
        if "q_proj" in names and names[-1] == "kernel":
            assert spec == (None, "model"), (names, spec)
            found["tp_kernel"] += 1
        if names[-1] == "count" or names[-1] == "notfinite_count":
            assert spec == (), (names, spec)
            found["scalar"] += 1
        if "corr_embed" in names and names[-1] == "kernel":
            # replicated param -> ZeRO-1 data-sharded moment
            assert "data" in spec, (names, spec)
            found["zero1"] += 1
    assert found["tp_kernel"] >= 2  # mu and nu
    assert found["zero1"] >= 2
    assert found["scalar"] >= 1
