"""Independent PyTorch implementation of the COTR architecture, used as a
numerical oracle for parity tests.

Written from the architectural spec (SURVEY.md §2.1) with torch.nn primitives;
parameter names follow the reference checkpoint layout so that
``cotr_tpu.models.torch_convert.flax_to_torch_state_dict`` output loads
directly.  This stands in for the released checkpoint (not downloadable in
this environment): if our Flax model matches this oracle bit-for-bit-ish on
random weights, the converter + model will match the released weights too.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

MAX_SIZE = 256


class FrozenBN(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.ones(n))
        self.register_buffer("bias", torch.zeros(n))
        self.register_buffer("running_mean", torch.zeros(n))
        self.register_buffer("running_var", torch.ones(n))

    def forward(self, x):
        scale = self.weight * (self.running_var + 1e-5).rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


class Bottleneck(nn.Module):
    def __init__(self, in_ch, width, stride=1):
        super().__init__()
        out_ch = width * 4
        self.conv1 = nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = FrozenBN(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = FrozenBN(width)
        self.conv3 = nn.Conv2d(width, out_ch, 1, bias=False)
        self.bn3 = FrozenBN(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                FrozenBN(out_ch))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class ResNetBody(nn.Module):
    def __init__(self, blocks=(3, 4, 6), widths=(64, 128, 256)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = FrozenBN(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        in_ch = 64
        for si, (n, w) in enumerate(zip(blocks, widths)):
            layers = []
            stride = 1 if si == 0 else 2
            for i in range(n):
                layers.append(Bottleneck(in_ch, w, stride if i == 0 else 1))
                in_ch = w * 4
            setattr(self, f"layer{si + 1}", nn.Sequential(*layers))
        self.num_stages = len(blocks)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for si in range(self.num_stages):
            x = getattr(self, f"layer{si + 1}")(x)
        return x


class BackboneWrap(nn.Module):
    """Holds the trunk at index 0 so keys read backbone.0.body.*"""

    def __init__(self, body):
        super().__init__()
        self.body = body


class EncLayer(nn.Module):
    def __init__(self, d, heads, ffn, dropout=0.0):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, heads, dropout=dropout)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, src, pos):
        q = k = src + pos
        a = self.self_attn(q, k, src)[0]
        src = self.norm1(src + a)
        f = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + f)


class DecLayer(nn.Module):
    def __init__(self, d, heads, ffn, dropout=0.0):
        super().__init__()
        self.multihead_attn = nn.MultiheadAttention(d, heads, dropout=dropout)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm2 = nn.LayerNorm(d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, mem, query_pos, pos):
        a = self.multihead_attn(tgt + query_pos, mem + pos, mem)[0]
        tgt = self.norm2(tgt + a)
        f = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + f)


class LayerHolder(nn.Module):
    def __init__(self, layers, norm=None):
        super().__init__()
        self.layers = nn.ModuleList(layers)
        if norm is not None:
            self.norm = norm


class TransformerWrap(nn.Module):
    def __init__(self, d, heads, enc, dec, ffn):
        super().__init__()
        self.encoder = LayerHolder([EncLayer(d, heads, ffn) for _ in range(enc)])
        self.decoder = LayerHolder([DecLayer(d, heads, ffn) for _ in range(dec)],
                                   norm=nn.LayerNorm(d))


class MLPHead(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Linear(d, d), nn.Linear(d, d), nn.Linear(d, 2)])

    def forward(self, x):
        x = F.relu(self.layers[0](x))
        x = F.relu(self.layers[1](x))
        return self.layers[2](x)


def nerf_encode(q: torch.Tensor, depth: int) -> torch.Tensor:
    bases = [i + 1 for i in range(depth)]
    return torch.cat([torch.sin(i * math.pi * q) for i in bases] +
                     [torch.cos(i * math.pi * q) for i in bases], dim=-1)


def image_pos_embedding(h: int, w: int, hidden_dim: int) -> torch.Tensor:
    """Mask-cumsum construction exactly as the reference
    (position_encoding.py:60-72) for a fully valid mask."""
    not_mask = torch.ones(1, h, w)
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    eps = 1e-6
    y = (y - 0.5) / (y[:, -1:, :] + eps)
    x = (x - 0.5) / (x[:, :, -1:] + eps)
    pos = torch.stack([x, y], dim=-1)  # (1, h, w, 2)
    return nerf_encode(pos, hidden_dim // 4).permute(0, 3, 1, 2)  # (1,C,h,w)


class TorchCOTR(nn.Module):
    def __init__(self, d=256, heads=8, enc=6, dec=6, ffn=1024,
                 blocks=(3, 4, 6), widths=(64, 128, 256), backbone_ch=1024):
        super().__init__()
        self.backbone = nn.Sequential(BackboneWrap(ResNetBody(blocks, widths)))
        self.input_proj = nn.Conv2d(backbone_ch, d, 1)
        self.transformer = TransformerWrap(d, heads, enc, dec, ffn)
        self.corr_embed = MLPHead(d)
        self.d = d

    @torch.no_grad()
    def forward(self, canvas: torch.Tensor, queries: torch.Tensor):
        """canvas (B, 3, 256, 512); queries (B, Q, 2) -> (B, Q, 2)."""
        body = self.backbone[0].body
        left = body(canvas[..., :MAX_SIZE])
        right = body(canvas[..., MAX_SIZE:])
        feats = torch.cat([left, right], dim=-1)
        src = self.input_proj(feats)
        b, c, h, w = src.shape
        pos = image_pos_embedding(h, w, self.d)

        src_seq = src.flatten(2).permute(2, 0, 1)
        pos_seq = pos.flatten(2).permute(2, 0, 1)
        q_embed = nerf_encode(queries, self.d // 4).permute(1, 0, 2)
        tgt = torch.zeros_like(q_embed)

        mem = src_seq
        for layer in self.transformer.encoder.layers:
            mem = layer(mem, pos_seq)
        for layer in self.transformer.decoder.layers:
            tgt = layer(tgt, mem, q_embed, pos_seq)
        tgt = self.transformer.decoder.norm(tgt)
        return self.corr_embed(tgt).permute(1, 0, 2)
