"""Fused cross-attention decode kernel (Pallas TPU).

The decoder's only quadratic-ish op is cross-attention between Q independent
queries and the 512 canvas tokens (SURVEY.md §5: queries are the scalable
axis; the dense pass decodes 131,072 of them, inference_helper.py:116-127).
Materializing the (B, H, Q, 512) logits in HBM costs ~1 GB per canvas per
layer at Q=131k; this kernel keeps each query tile's logits in VMEM:

    per (batch*head, query-tile) grid cell:
        logits = q_tile @ k^T * scale     (MXU, f32 accum, VMEM resident)
        probs  = softmax(logits)          (VPU)
        out    = probs @ v                (MXU)

K/V for one head are 512 x 32 — VMEM-resident across the whole query sweep,
so HBM traffic is exactly q + out (+K/V once): the flash-attention bound.
The 512-token context fits in ONE block, so no online-softmax running
maxima are needed — this is the degenerate (and optimal) flash case.

Used by MultiHeadAttention when cfg.use_flash_attention is set and dropout
is inactive; falls back to the XLA einsum path otherwise (CPU, training
with attention dropout, or interpret-mode debugging).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, out_ref):
    # blocks: q (1, TQ, hd); k/v (1, S, hd); out (1, TQ, hd)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jax.lax.dot_general(
        q * scale, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (TQ, S)
    probs = jax.nn.softmax(logits, axis=-1).astype(v_ref.dtype)
    out_ref[0] = jnp.dot(probs, v_ref[0],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret"))
def flash_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          q_tile: int = 512,
                          interpret: bool = False) -> jnp.ndarray:
    """q: (B, Lq, H, hd); k, v: (B, S, H, hd) -> (B, Lq, H, hd).

    Lq is padded to a multiple of ``q_tile`` internally (queries are
    independent, padding cannot perturb real outputs).
    """
    b, lq, h, hd = q.shape
    s = k.shape[1]
    lq_pad = -(-lq // q_tile) * q_tile
    if lq_pad != lq:
        q = jnp.concatenate(
            [q, jnp.zeros((b, lq_pad - lq, h, hd), q.dtype)], axis=1)

    # fold heads into the leading grid axis: (B*H, L, hd)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, lq_pad, hd)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, s, hd)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, s, hd)

    grid = (b * h, lq_pad // q_tile)
    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    out = out.reshape(b, h, lq_pad, hd).transpose(0, 2, 1, 3)
    return out[:, :lq]
