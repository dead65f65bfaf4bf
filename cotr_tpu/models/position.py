"""Sinusoidal positional encodings.

Two users share one primitive (reference COTR/models/position_encoding.py):

* query embedding: NeRF-style sine expansion of normalized (x, y) query points
  with *linear* bases i = 1..depth (``lin_sine``) or exponential 2**i
  (``exp_sine``)  — reference position_encoding.py:29-45;
* image positional map: per-pixel-center normalized coordinates run through the
  same expansion — reference position_encoding.py:48-72.  The reference derives
  pixel centers from a padding-mask cumsum; our canvases are always exactly
  (256, 512) with no padding, so the closed form (i + 0.5) / extent is exact
  and is precomputed once per feature-map shape.

Channel ordering matters for torch-checkpoint parity: the expansion
concatenates [sin(1·pi·x), sin(1·pi·y), sin(2·pi·x), sin(2·pi·y), ...,
cos(1·pi·x), cos(1·pi·y), ...] exactly like the reference's torch.cat over
bases (position_encoding.py:43).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def sine_bases(depth: int, sine_type: str) -> np.ndarray:
    if sine_type == "lin_sine":
        return np.arange(1, depth + 1, dtype=np.float64)
    if sine_type == "exp_sine":
        return 2.0 ** np.arange(depth, dtype=np.float64)
    raise ValueError(f"unknown sine_type: {sine_type}")


def nerf_positional_encoding(coords: jnp.ndarray, depth: int,
                             sine_type: str = "lin_sine") -> jnp.ndarray:
    """Expand (..., D) coordinates to (..., 2 * depth * D).

    Matches reference position_encoding.py:41-45 including channel order:
    the per-base blocks keep the input's coordinate order, sines first.
    """
    bases = jnp.asarray(sine_bases(depth, sine_type), dtype=coords.dtype)
    # (..., D) -> (..., depth, D): angle[b, d] = base_b * pi * coord_d
    ang = coords[..., None, :] * (bases[:, None] * jnp.pi)
    sin = jnp.sin(ang).reshape(*coords.shape[:-1], depth * coords.shape[-1])
    cos = jnp.cos(ang).reshape(*coords.shape[:-1], depth * coords.shape[-1])
    return jnp.concatenate([sin, cos], axis=-1)


@functools.lru_cache(maxsize=8)
def image_position_embedding(h: int, w: int, hidden_dim: int = 256,
                             sine_type: str = "lin_sine") -> np.ndarray:
    """Positional map for an unpadded (h, w) feature grid -> (h, w, hidden_dim).

    Closed form of the reference's masked-cumsum construction for a fully
    valid mask (position_encoding.py:60-72): with not_mask all ones,
    cumsum(axis) at index i equals i + 1 and the last value equals the extent,
    so  y = (i + 0.5) / (h + 1e-6),  x = (j + 0.5) / (w + 1e-6).
    The (x, y) pair is then sine-expanded with depth hidden_dim // 4.
    """
    eps = 1e-6
    ys = (np.arange(h, dtype=np.float64) + 0.5) / (h + eps)
    xs = (np.arange(w, dtype=np.float64) + 0.5) / (w + eps)
    grid_x, grid_y = np.meshgrid(xs, ys)  # each (h, w)
    coords = np.stack([grid_x, grid_y], axis=-1)  # (h, w, 2)

    depth = hidden_dim // 4  # 2 coords * 2 (sin, cos) * depth == hidden_dim
    bases = sine_bases(depth, sine_type)
    ang = coords[..., None, :] * (bases[:, None] * np.pi)  # (h, w, depth, 2)
    pos = np.concatenate([np.sin(ang).reshape(h, w, depth * 2),
                          np.cos(ang).reshape(h, w, depth * 2)], axis=-1)
    return pos.astype(np.float32)
