"""DETR-derived encoder-decoder for correspondence regression, Flax/NHWC.

Semantics match the reference transformer (COTR/models/transformer.py):

* post-norm residual blocks, ReLU FFN, dropout on attention probabilities and
  residual branches (transformer.py:122-201);
* positional embeddings are *added to Q and K at every layer*, never to V
  (transformer.py:148-153, 192-195);
* the decoder has **no query self-attention** — only cross-attention to the
  encoder memory (transformer.py:162-201 defines only ``multihead_attn``), so
  every query is independent: the whole inference engine batches over queries;
* the decoder target starts at zeros and the learned query embedding enters
  only through Q at each layer (transformer.py:54, 192);
* a final LayerNorm is applied to the decoder output (transformer.py:33, 110).

Weight init follows the reference: xavier-uniform for every parameter with
ndim > 1 (transformer.py:42-45).

Layout: we keep (B, L, D) batch-major throughout — the reference's (L, B, D)
is a torch MultiheadAttention artifact with no TPU benefit.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

xavier = nn.initializers.xavier_uniform()


def matmul_precision(dtype) -> jax.lax.Precision:
    """float32 means *real* float32: on TPU, f32 matmuls default to fast
    bfloat16 passes (~1e-2 error), which would break sub-pixel parity. The
    bfloat16 compute path keeps DEFAULT (native MXU) precision."""
    return (jax.lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _dense(features: int, dtype, name: str) -> nn.Dense:
    return nn.Dense(features, kernel_init=xavier, dtype=dtype,
                    param_dtype=jnp.float32,
                    precision=matmul_precision(dtype), name=name)


class MultiHeadAttention(nn.Module):
    """Scaled-dot-product MHA matching torch.nn.MultiheadAttention math.

    Dropout is applied to the attention probabilities, as torch does.
    """

    d_model: int
    nheads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 *, deterministic: bool = True,
                 key_padding_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, lq, _ = q.shape
        lk = k.shape[1]
        h, hd = self.nheads, self.d_model // self.nheads

        qp = _dense(self.d_model, self.dtype, "q_proj")(q)
        kp = _dense(self.d_model, self.dtype, "k_proj")(k)
        vp = _dense(self.d_model, self.dtype, "v_proj")(v)

        qp = qp.reshape(b, lq, h, hd)
        kp = kp.reshape(b, lk, h, hd)
        vp = vp.reshape(b, lk, h, hd)

        if (self.use_flash and key_padding_mask is None
                and (deterministic or self.dropout == 0.0)
                and jax.default_backend() == "tpu"):
            # fused Pallas kernel: logits stay in VMEM
            # (cotr_tpu/ops/pallas_attention.py)
            from cotr_tpu.ops.pallas_attention import flash_cross_attention

            out = flash_cross_attention(qp, kp, vp)
            out = out.reshape(b, lq, self.d_model)
            return _dense(self.d_model, self.dtype, "out_proj")(out)

        prec = matmul_precision(self.dtype)
        scale = 1.0 / np.sqrt(hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qp * scale, kp, precision=prec)
        if key_padding_mask is not None:
            # True marks padded (invalid) keys, as in torch.
            neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vp,
                         precision=prec).reshape(b, lq, self.d_model)
        return _dense(self.d_model, self.dtype, "out_proj")(out)


class FFN(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        y = _dense(self.dim_feedforward, self.dtype, "linear1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = _dense(self.d_model, self.dtype, "linear2")(y)
        return y


class EncoderLayer(nn.Module):
    """Self-attention layer; Q = K = src + pos (transformer.py:143-159)."""

    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, src: jnp.ndarray, pos: jnp.ndarray, *,
                 deterministic: bool = True,
                 key_padding_mask: Optional[jnp.ndarray] = None):
        qk = src + pos
        attn = MultiHeadAttention(self.d_model, self.nheads, self.dropout,
                                  self.dtype, self.use_flash,
                                  name="self_attn")(
            qk, qk, src, deterministic=deterministic,
            key_padding_mask=key_padding_mask)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn)
        ff = FFN(self.d_model, self.dim_feedforward, self.dropout, self.dtype,
                 name="ffn")(src, deterministic=deterministic)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + ff)


class DecoderLayer(nn.Module):
    """Cross-attention-only decoder layer (transformer.py:185-201).

    Norm names mirror the reference's norm2/norm3 (its norm1 belongs to the
    removed self-attention and is unused).
    """

    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray,
                 query_pos: jnp.ndarray, pos: jnp.ndarray, *,
                 deterministic: bool = True,
                 key_padding_mask: Optional[jnp.ndarray] = None):
        attn = MultiHeadAttention(self.d_model, self.nheads, self.dropout,
                                  self.dtype, self.use_flash,
                                  name="cross_attn")(
            tgt + query_pos, memory + pos, memory,
            deterministic=deterministic, key_padding_mask=key_padding_mask)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + attn)
        ff = FFN(self.d_model, self.dim_feedforward, self.dropout, self.dtype,
                 name="ffn")(tgt, deterministic=deterministic)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt + ff)


class Transformer(nn.Module):
    """Encoder over 512 canvas tokens + decoder over independent queries.

    Split into :meth:`encode` / :meth:`decode` so the engine can run the
    expensive canvas encode once and decode arbitrarily many query chunks
    against the cached memory — the TPU-first replacement for the reference's
    full re-forward per batch (sparse_engine.py:47-56).

    ``decode`` returns the decoder states of every layer, normed, stacked on
    axis 0 when asked (return_intermediate semantics, transformer.py:107-117);
    the model head consumes only the last (cotr_model.py:39).
    """

    d_model: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False

    def setup(self):
        enc_cls = nn.remat(EncoderLayer) if self.remat else EncoderLayer
        dec_cls = nn.remat(DecoderLayer) if self.remat else DecoderLayer
        self.encs = [enc_cls(self.d_model, self.nheads,
                             self.dim_feedforward, self.dropout,
                             self.dtype, self.use_flash, name=f"enc{i}")
                     for i in range(self.enc_layers)]
        self.decs = [dec_cls(self.d_model, self.nheads,
                             self.dim_feedforward, self.dropout,
                             self.dtype, self.use_flash, name=f"dec{i}")
                     for i in range(self.dec_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def encode(self, src_tokens: jnp.ndarray, pos_tokens: jnp.ndarray, *,
               deterministic: bool = True,
               key_padding_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        mem = src_tokens
        for layer in self.encs:
            mem = layer(mem, pos_tokens, deterministic=deterministic,
                        key_padding_mask=key_padding_mask)
        return mem

    def decode(self, memory: jnp.ndarray, pos_tokens: jnp.ndarray,
               query_embed: jnp.ndarray, *, deterministic: bool = True,
               key_padding_mask: Optional[jnp.ndarray] = None,
               return_intermediate: bool = False):
        tgt = jnp.zeros_like(query_embed)
        intermediate = []
        for layer in self.decs:
            tgt = layer(tgt, memory, query_embed, pos_tokens,
                        deterministic=deterministic,
                        key_padding_mask=key_padding_mask)
            if return_intermediate:
                intermediate.append(self.decoder_norm(tgt))
        out = self.decoder_norm(tgt)
        if return_intermediate:
            intermediate[-1] = out
            return jnp.stack(intermediate, axis=0)
        return out[None]

    def __call__(self, src_tokens: jnp.ndarray, pos_tokens: jnp.ndarray,
                 query_embed: jnp.ndarray, *, deterministic: bool = True,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 return_intermediate: bool = False):
        mem = self.encode(src_tokens, pos_tokens, deterministic=deterministic,
                          key_padding_mask=key_padding_mask)
        hs = self.decode(mem, pos_tokens, query_embed,
                         deterministic=deterministic,
                         key_padding_mask=key_padding_mask,
                         return_intermediate=return_intermediate)
        return hs, mem
