"""Multi-chip inference: squad axis sharded over the mesh must reproduce
single-device results exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cotr_tpu import COTRConfig, build_model
from cotr_tpu.inference.grouped import GroupedStepper
from cotr_tpu.inference.runner import ModelRunner
from cotr_tpu.parallel.mesh import make_mesh


@pytest.mark.slow
def test_sharded_grouped_step_matches_single_device():
    assert len(jax.devices()) >= 8
    cfg = COTRConfig(enc_layers=1, dec_layers=1, dropout=0.0)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)),
                        jnp.zeros((1, 2, 2)))
    runner = ModelRunner(model, params)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 1, (512, 512, 3)).astype(np.float32))
    g, m = 8, 16
    boxes = np.concatenate(
        [rng.uniform(0, 256, (g, 2)).astype(np.float32),
         np.full((g, 2), 256, np.float32)], axis=1)
    queries = rng.uniform(0.05, 0.45, (g, m, 2)).astype(np.float32)

    single = GroupedStepper(runner)(img, img, boxes, boxes, queries)
    mesh = make_mesh(8)
    sharded = GroupedStepper(runner, mesh=mesh)(img, img, boxes, boxes,
                                                queries)
    np.testing.assert_allclose(sharded, single, atol=1e-5)
