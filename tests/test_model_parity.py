"""Full-model numerical parity: Flax COTR vs the independent torch oracle.

This is the stand-in for "golden-value parity against the released PyTorch
checkpoint" (SURVEY.md §4): same architecture, weights transferred through the
checkpoint converter, identical outputs expected to float32 tolerance. It
exercises every converter mapping (conv layouts, packed qkv, layernorms).
"""

import jax
import numpy as np
import pytest
import torch

from cotr_tpu import COTRConfig, build_model
from cotr_tpu.models.torch_convert import (flax_to_torch_state_dict,
                                           torch_state_dict_to_flax)
from tests.torch_oracle import TorchCOTR


@pytest.fixture(scope="module")
def small_cfg():
    # Full resnet50/layer3 backbone; reduced transformer depth for speed.
    return COTRConfig(enc_layers=2, dec_layers=2, dropout=0.0)


@pytest.fixture(scope="module")
def flax_model_and_params(small_cfg):
    model = build_model(small_cfg)
    canvas = np.zeros((1, 256, 512, 3), np.float32)
    queries = np.zeros((1, 4, 2), np.float32)
    params = model.init(jax.random.PRNGKey(3), canvas, queries)
    return model, params


def test_roundtrip_conversion(small_cfg, flax_model_and_params):
    _, params = flax_model_and_params
    sd = flax_to_torch_state_dict(params, small_cfg)
    back = torch_state_dict_to_flax(sd, small_cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda kv: str(kv[0])),
                                  sorted(flat_b, key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.slow
def test_forward_parity_with_torch_oracle(small_cfg, flax_model_and_params):
    model, params = flax_model_and_params
    oracle = TorchCOTR(enc=small_cfg.enc_layers, dec=small_cfg.dec_layers)
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in flax_to_torch_state_dict(params, small_cfg).items()}
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"
    assert not [m for m in missing if "num_batches" not in m], missing

    rng = np.random.RandomState(7)
    canvas_hwc = rng.uniform(-1, 1, (2, 256, 512, 3)).astype(np.float32)
    queries = rng.uniform(0.02, 0.98, (2, 5, 2)).astype(np.float32)

    ours = np.asarray(model.apply(params, canvas_hwc, queries))
    oracle.eval()
    theirs = oracle(torch.from_numpy(canvas_hwc.transpose(0, 3, 1, 2)),
                    torch.from_numpy(queries)).numpy()
    assert ours.shape == theirs.shape == (2, 5, 2)
    err = np.abs(ours - theirs).max()
    # <1px on the 512-wide canvas means < 1/512 ~ 2e-3 in normalized units;
    # we demand far tighter.
    assert err < 2e-4, f"max deviation {err}"


def test_split_canvas_no_cross_leak(small_cfg, flax_model_and_params):
    """Changing the right half must not affect features queried on the left
    half *through the backbone* (cross-attention does mix globally; here we
    check the backbone split directly)."""
    from cotr_tpu.models.resnet import SplitCanvasBackbone
    model, params = flax_model_and_params
    bb = SplitCanvasBackbone()
    bb_params = {"params": params["params"]["backbone"]}
    rng = np.random.RandomState(0)
    canvas = rng.uniform(-1, 1, (1, 256, 512, 3)).astype(np.float32)
    f1 = np.asarray(bb.apply(bb_params, canvas))
    canvas2 = canvas.copy()
    canvas2[:, :, 256:] = rng.uniform(-1, 1, (1, 256, 256, 3))
    f2 = np.asarray(bb.apply(bb_params, canvas2))
    np.testing.assert_array_equal(f1[:, :, :16], f2[:, :, :16])
    assert np.abs(f1[:, :, 16:] - f2[:, :, 16:]).max() > 1e-3


def test_npz_weights_roundtrip(tmp_path):
    """save_params_npz / load_params: the committable release format must
    reproduce bf16-cast params bit-exactly and preserve non-float leaves."""
    import numpy as np

    from cotr_tpu.models.checkpoint_io import (_flatten, load_params,
                                               save_params_npz)

    rng = np.random.RandomState(0)
    params = {"params": {
        "block": {"kernel": rng.randn(16, 8).astype(np.float32) * 3,
                  "bias": rng.randn(8).astype(np.float32)},
        "count": np.arange(4, dtype=np.int32)}}
    path = str(tmp_path / "w.npz")
    save_params_npz(params, path)
    back = load_params(path, None)

    import jax
    import ml_dtypes

    fa = _flatten(params)
    fb = _flatten(jax.tree_util.tree_map(np.asarray, back))
    assert set(fa) == set(fb)
    for k, v in fa.items():
        if v.dtype == np.float32:
            exact = v.astype(ml_dtypes.bfloat16).astype(np.float32)
            np.testing.assert_array_equal(fb[k], exact, err_msg=k)
        else:
            np.testing.assert_array_equal(fb[k], v, err_msg=k)


def test_npz_weights_half_dtypes_and_collections(tmp_path):
    """Regression (r3 review): f16/bf16 leaves must go through the
    bit-pattern path (np.load returns raw ml_dtypes leaves as void '|V2',
    which is unloadable), and a multi-collection variables dict must not be
    double-wrapped on load."""
    import numpy as np
    import ml_dtypes

    from cotr_tpu.models.checkpoint_io import load_params, save_params_npz

    tree = {"params": {"layer": {
        "half": np.ones((4,), np.float16) * 1.5,
        "bf": np.full((3,), 2.25, ml_dtypes.bfloat16),
        "step": np.asarray(7, np.int32)}}}
    path = str(tmp_path / "w.npz")
    save_params_npz(tree, path)
    back = load_params(path, None)
    layer = back["params"]["layer"]
    np.testing.assert_allclose(np.asarray(layer["half"], np.float32), 1.5)
    np.testing.assert_allclose(np.asarray(layer["bf"], np.float32), 2.25)
    assert int(np.asarray(layer["step"])) == 7

    multi = {"params": {"a": np.ones((2, 2), np.float32)},
             "batch_stats": {"m": np.zeros((2,), np.float32)}}
    path2 = str(tmp_path / "w2.npz")
    save_params_npz(multi, path2)
    back2 = load_params(path2, None)
    assert set(back2) == {"params", "batch_stats"}
