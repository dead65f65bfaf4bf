"""Pallas fused cross-attention: interpret-mode parity vs the einsum path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cotr_tpu.ops.pallas_attention import flash_cross_attention


def _reference(q, k, v):
    hd = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q / np.sqrt(hd), k)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@pytest.mark.parametrize("lq", [512, 600, 1])
def test_flash_attention_matches_einsum(lq):
    rng = np.random.RandomState(0)
    b, h, hd, s = 2, 4, 32, 512
    q = jnp.asarray(rng.randn(b, lq, h, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, hd).astype(np.float32))
    out = np.asarray(flash_cross_attention(q, k, v, interpret=True))
    ref = np.asarray(_reference(q, k, v))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.slow
def test_model_flag_runs_with_flash_disabled_fallback():
    """use_flash on CPU falls through cleanly when interpret-mode isn't
    requested only if the flag stays off — verify the flag plumbs through
    model construction without changing the param tree."""
    from cotr_tpu import COTRConfig, build_model

    cfg_a = COTRConfig(enc_layers=1, dec_layers=1)
    cfg_b = COTRConfig(enc_layers=1, dec_layers=1, use_flash_attention=True)
    m_a = build_model(cfg_a)
    m_b = build_model(cfg_b)
    canvas = jnp.zeros((1, 256, 512, 3))
    queries = jnp.zeros((1, 2, 2))
    p_a = m_a.init(jax.random.PRNGKey(0), canvas, queries)
    p_b = m_b.init(jax.random.PRNGKey(0), canvas, queries)
    sa = jax.tree_util.tree_structure(p_a)
    sb = jax.tree_util.tree_structure(p_b)
    assert sa == sb
