"""ModelRunner: jitted encode/decode entry points over a loaded model.

The TPU-first replacement for the reference's ``model.forward`` calls
scattered through the engine (sparse_engine.py:47-56, inference_helper.py:126):
the canvas encode (ResNet + encoder, ~7 GFLOP) is jitted separately from the
query decode (~2 MFLOP/query), so dense passes and grouped refinement encode
each canvas once and stream query chunks through the decoder.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ModelRunner:
    """Holds (model, params) and compiled encode/decode/forward closures.

    Shapes are static per (batch, query-count) combination; callers should
    bucket their batch/query sizes to bound recompilation.
    """

    def __init__(self, model: Any, params: Any, decode_chunk: int = 8192):
        self.model = model
        self.params = params
        self.decode_chunk = decode_chunk

        self._encode = jax.jit(
            lambda p, c: model.apply(p, c, method="encode"))
        self._decode = jax.jit(
            lambda p, m, q: model.apply(p, m, q, method="decode"))
        self._forward = jax.jit(
            lambda p, c, q: model.apply(p, c, q))

        def decode_scan(p, m, q_chunks):  # q_chunks: (K, B, chunk, 2)
            def body(carry, q):
                return carry, model.apply(p, m, q, method="decode")
            _, outs = jax.lax.scan(body, None, q_chunks)
            return outs  # (K, B, chunk, 2)

        self._decode_scan = jax.jit(decode_scan)

    # -- device-level calls (accept/return device or numpy arrays) ---------

    def encode(self, canvas) -> jnp.ndarray:
        """(B, 256, 512, 3) normalized canvas -> (B, 512, d) memory."""
        return self._encode(self.params, jnp.asarray(canvas))

    def decode(self, memory, queries) -> jnp.ndarray:
        """(B, 512, d) + (B, Q, 2) -> (B, Q, 2)."""
        return self._decode(self.params, memory, jnp.asarray(queries))

    def forward(self, canvas, queries) -> jnp.ndarray:
        """Reference-equivalent full forward (B, 256, 512, 3)+(B, Q, 2)->(B, Q, 2)."""
        return self._forward(self.params, jnp.asarray(canvas),
                             jnp.asarray(queries))

    def decode_chunked(self, memory, queries) -> jnp.ndarray:
        """Decode many queries against cached memory in fixed-size chunks.

        queries (B, Q, 2); Q is padded up to a multiple of ``decode_chunk``
        (padding decoded then discarded - queries are independent, so padding
        cannot perturb real outputs).
        """
        queries = jnp.asarray(queries)
        b, q, _ = queries.shape
        chunk = min(self.decode_chunk, q)
        k = -(-q // chunk)
        pad = k * chunk - q
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.zeros((b, pad, 2), queries.dtype)], axis=1)
        q_chunks = queries.reshape(b, k, chunk, 2).transpose(1, 0, 2, 3)
        outs = self._decode_scan(self.params, memory, q_chunks)
        outs = outs.transpose(1, 0, 2, 3).reshape(b, k * chunk, 2)
        return outs[:, :q]
