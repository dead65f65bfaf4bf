"""Top-level COTR model (reference COTR/models/cotr_model.py:15-51).

forward(canvas, queries) -> (B, Q, 2) predicted correspondences:

    backbone (split-canvas ResNet, frozen BN)      cotr_model.py:29
      -> 1x1 input projection to d_model           cotr_model.py:23
      -> + sine image positional map               position_encoding.py:48-72
      -> transformer encoder (512 tokens)
    queries (B, Q, 2 normalized canvas coords)
      -> NeRF sine embedding, depth d_model//4     cotr_model.py:22
      -> decoder cross-attention over memory
      -> 3-layer MLP head -> (x, y)                cotr_model.py:21

All coordinates follow the canvas convention (x in [0,1] across the double
width, left image x<0.5, right image x>0.5).

The correspondence head always computes in float32 even when the trunk runs
bfloat16 — sub-pixel output precision is the product.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cotr_tpu.config import COTRConfig
from cotr_tpu.models.position import image_position_embedding, nerf_positional_encoding
from cotr_tpu.models.resnet import SplitCanvasBackbone
from cotr_tpu.models.transformer import Transformer, matmul_precision, xavier


class CorrHead(nn.Module):
    """MLP(d, d, 2, num_layers=3) regression head (position_encoding.py:14-26)."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        prec = jax.lax.Precision.HIGHEST
        x = nn.relu(nn.Dense(self.hidden_dim, kernel_init=xavier,
                             precision=prec, name="fc0")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, kernel_init=xavier,
                             precision=prec, name="fc1")(x))
        return nn.Dense(2, kernel_init=xavier, precision=prec, name="fc2")(x)


class COTRModel(nn.Module):
    """Exposes three entry points (use via ``model.apply(vars, ..., method=)``):

    * ``__call__(canvas, queries)`` — full forward, reference-compatible;
    * ``encode(canvas)`` — canvas -> encoder memory tokens (B, 512, d).
      This is the expensive part (ResNet + 6 encoder layers);
    * ``decode(memory, queries)`` — memory + queries -> (B, Q, 2).
      Cheap per query; the inference engine caches ``encode`` outputs and
      streams query chunks through ``decode``.
    """

    cfg: COTRConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.backbone = SplitCanvasBackbone(cfg.backbone, cfg.layer,
                                            cfg.dilation, dtype=dtype)
        self.input_proj = nn.Conv(cfg.hidden_dim, (1, 1), use_bias=True,
                                  dtype=dtype, param_dtype=jnp.float32,
                                  precision=matmul_precision(dtype))
        self.transformer = Transformer(
            d_model=cfg.hidden_dim,
            nheads=cfg.nheads,
            enc_layers=cfg.enc_layers,
            dec_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            dtype=dtype,
            use_flash=cfg.use_flash_attention,
            remat=cfg.remat,
        )
        self.corr_embed = CorrHead(cfg.hidden_dim)

    def _pos_tokens(self, n_tokens_hw, dtype):
        fh, fw = n_tokens_hw
        pos = image_position_embedding(fh, fw, self.cfg.hidden_dim,
                                       self.cfg.position_embedding)
        return jnp.asarray(pos.reshape(1, fh * fw, self.cfg.hidden_dim),
                           dtype=dtype)

    def encode(self, canvas: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """canvas (B, 256, 512, 3) normalized NHWC -> memory (B, 512, d)."""
        dtype = jnp.dtype(self.cfg.dtype)
        feats = self.backbone(canvas.astype(dtype))
        b, fh, fw, _ = feats.shape
        src = self.input_proj(feats).reshape(b, fh * fw, self.cfg.hidden_dim)
        pos = jnp.broadcast_to(self._pos_tokens((fh, fw), dtype), src.shape)
        return self.transformer.encode(src, pos, deterministic=not train)

    def decode(self, memory: jnp.ndarray, queries: jnp.ndarray, *,
               train: bool = False,
               return_intermediate: bool = False) -> jnp.ndarray:
        """memory (B, 512, d) + queries (B, Q, 2) -> (B, Q, 2)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        # token grid for the standard canvas: 256/stride x 512/stride
        fh = 256 // cfg.backbone_stride
        fw = 512 // cfg.backbone_stride
        pos = jnp.broadcast_to(self._pos_tokens((fh, fw), dtype), memory.shape)
        # Query sine embedding (cotr_model.py:22,33-36). No gradient flows to
        # the queries anyway (they are inputs), matching @torch.no_grad.
        q_embed = nerf_positional_encoding(
            queries.astype(jnp.float32), cfg.hidden_dim // 4,
            cfg.position_embedding).astype(dtype)
        hs = self.transformer.decode(memory, pos, q_embed,
                                     deterministic=not train,
                                     return_intermediate=return_intermediate)
        if return_intermediate:
            return self.corr_embed(hs)  # (layers, B, Q, 2)
        return self.corr_embed(hs[-1])  # (B, Q, 2)

    def __call__(self, canvas: jnp.ndarray, queries: jnp.ndarray, *,
                 train: bool = False,
                 return_intermediate: bool = False) -> jnp.ndarray:
        """canvas: (B, 256, 512, 3) ImageNet-normalized NHWC;
        queries: (B, Q, 2) normalized canvas coords.
        Returns (B, Q, 2), or (dec_layers, B, Q, 2) with return_intermediate.
        """
        memory = self.encode(canvas, train=train)
        return self.decode(memory, queries, train=train,
                           return_intermediate=return_intermediate)


def build_model(cfg: Optional[COTRConfig] = None) -> COTRModel:
    """Facade mirroring reference models/__init__.py build_model(args)."""
    return COTRModel(cfg or COTRConfig())
