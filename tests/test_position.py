"""Positional-encoding parity vs the reference formulas."""

import numpy as np
import torch

from cotr_tpu.models.position import (image_position_embedding,
                                      nerf_positional_encoding, sine_bases)
from tests.torch_oracle import image_pos_embedding, nerf_encode


def test_nerf_encoding_matches_torch_ordering():
    q = np.random.RandomState(0).uniform(0, 1, (5, 7, 2)).astype(np.float32)
    ours = np.asarray(nerf_positional_encoding(q, depth=64))
    theirs = nerf_encode(torch.from_numpy(q), 64).numpy()
    assert ours.shape == (5, 7, 256)
    # float32 association order differs (ours: coord * (base*pi)); for large
    # bases (64*pi*x, arg ~ 200) a one-ulp argument difference moves sin by
    # ~1e-5 — irrelevant to sub-pixel parity.
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_exp_sine_bases():
    assert list(sine_bases(4, "exp_sine")) == [1.0, 2.0, 4.0, 8.0]
    assert list(sine_bases(4, "lin_sine")) == [1.0, 2.0, 3.0, 4.0]


def test_image_position_embedding_matches_cumsum_construction():
    """Our closed form must equal the reference's mask-cumsum construction."""
    ours = image_position_embedding(16, 32, 256)  # (16, 32, 256)
    theirs = image_pos_embedding(16, 32, 256)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_image_position_embedding_is_cached():
    a = image_position_embedding(16, 32, 256)
    b = image_position_embedding(16, 32, 256)
    assert a is b
