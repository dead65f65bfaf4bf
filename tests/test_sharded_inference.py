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


@pytest.mark.slow
def test_sharded_faster_engine_end_to_end_matches_single_device():
    """FasterSparseEngine with a mesh (squad axis sharded over 8 devices)
    must reproduce the single-device engine's correspondences exactly —
    the full public path: dense seeding, squad formation, grouped dispatch,
    conclude (VERDICT.md round-1 item 6)."""
    from cotr_tpu.inference.engine import FasterSparseEngine

    assert len(jax.devices()) >= 8
    cfg = COTRConfig(enc_layers=1, dec_layers=1, dropout=0.0)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)),
                        jnp.zeros((1, 2, 2)))

    rng = np.random.RandomState(1)
    img_a = rng.randint(0, 255, (256, 256, 3), np.uint8)
    img_b = rng.randint(0, 255, (256, 256, 3), np.uint8)
    queries = rng.uniform(30, 226, (12, 2)).astype(np.float64)
    kw = dict(zoom_ins=[0.5], converge_iters=1, max_corrs=12,
              queries_a=queries, force=True)

    single = FasterSparseEngine(ModelRunner(model, params), mode="tile",
                                task_bucket=8)
    corrs_single = single.cotr_corr_multiscale(img_a, img_b, **kw)

    mesh = make_mesh(8)
    sharded = FasterSparseEngine(ModelRunner(model, params), mode="tile",
                                 task_bucket=8, mesh=mesh)
    corrs_sharded = sharded.cotr_corr_multiscale(img_a, img_b, **kw)

    assert corrs_single.shape == corrs_sharded.shape == (12, 4)
    np.testing.assert_allclose(corrs_sharded, corrs_single, atol=1e-3)


@pytest.mark.slow
def test_sharded_scan_engine_matches_single_device():
    """Default SparseEngine (scan path) with a mesh — task axis sharded
    over 8 devices — must reproduce the single-device engine
    (VERDICT.md round-2 item 6: the scan path had no mesh support)."""
    from cotr_tpu.inference.engine import SparseEngine

    assert len(jax.devices()) >= 8
    cfg = COTRConfig(enc_layers=1, dec_layers=1, dropout=0.0)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)),
                        jnp.zeros((1, 2, 2)))

    rng = np.random.RandomState(2)
    img_a = rng.randint(0, 255, (256, 256, 3), np.uint8)
    img_b = rng.randint(0, 255, (256, 256, 3), np.uint8)
    queries = rng.uniform(30, 226, (12, 2)).astype(np.float64)
    kw = dict(zoom_ins=[0.5, 0.25], converge_iters=2, max_corrs=12,
              queries_a=queries, force=True)

    single = SparseEngine(ModelRunner(model, params), mode="tile",
                          task_bucket=8)
    corrs_single = single.cotr_corr_multiscale(img_a, img_b, **kw)

    mesh = make_mesh(8)
    sharded = SparseEngine(ModelRunner(model, params), mode="tile",
                           task_bucket=8, mesh=mesh)
    corrs_sharded = sharded.cotr_corr_multiscale(img_a, img_b, **kw)

    assert corrs_single.shape == corrs_sharded.shape == (12, 4)
    np.testing.assert_allclose(corrs_sharded, corrs_single, atol=1e-3)
