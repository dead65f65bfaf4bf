"""Golden-value regression: the full model forward on fixed seeds must stay
bit-stable across refactors (CPU float32). The golden file regenerates with
--update-goldens semantics: delete tests/golden/model_forward.npz and re-run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "model_forward.npz")


def _compute():
    from cotr_tpu import COTRConfig, build_model

    cfg = COTRConfig(enc_layers=2, dec_layers=2, dropout=0.0)
    model = build_model(cfg)
    rng = np.random.RandomState(99)
    canvas = rng.uniform(-1, 1, (1, 256, 512, 3)).astype(np.float32)
    queries = rng.uniform(0.05, 0.95, (1, 6, 2)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(7), jnp.asarray(canvas),
                        jnp.asarray(queries))
    out = np.asarray(model.apply(params, canvas, queries))
    mem = np.asarray(model.apply(params, canvas, method="encode"))
    return out, mem[:, :8, :8]


def test_model_forward_golden():
    out, mem = _compute()
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, out=out, mem=mem)
        raise AssertionError(
            "golden file created on first run — re-run to validate")
    g = np.load(GOLDEN)
    # CPU f32 with HIGHEST precision: tolerate only tiny cross-version noise
    np.testing.assert_allclose(out, g["out"], atol=1e-5)
    np.testing.assert_allclose(mem, g["mem"], atol=1e-4)
