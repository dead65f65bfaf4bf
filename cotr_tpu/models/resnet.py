"""ResNet backbone with frozen batch normalization, NHWC, Flax.

TPU-native stand-in for the reference's torchvision ResNet-50 with
FrozenBatchNorm2d (reference COTR/models/backbone.py:20-107).  Key behaviors
reproduced:

* FrozenBN: y = x * w / sqrt(rv + 1e-5) + (b - rm * w / sqrt(rv + 1e-5)),
  statistics and affine parameters are plain (non-learned) constants
  (backbone.py:46-56);
* bottleneck v1.5 layout (stride on the 3x3 conv) as in torchvision resnet50;
* feature taps at layer1..layer4 with channels 256/512/1024/2048 and strides
  4/8/16/32; default tap is layer3 (backbone.py:70);
* split-canvas forward: the (256, 512) side-by-side canvas is split into its
  two 256-square halves, both halves run through the CNN *as a doubled batch*
  (mathematically identical to the reference's two sequential calls,
  backbone.py:79-92, but better for MXU utilization), and the feature maps are
  re-concatenated along width — this prevents cross-image leakage through conv
  padding.

Weights land in ordinary ``params`` and are frozen via optimizer masks
(see cotr_tpu/training/optim.py), mirroring the reference's
requires_grad_(False) policy (backbone.py:63-66).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cotr_tpu.utils.constants import MAX_SIZE


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params (backbone.py:20-56)."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        rm = self.param("running_mean", nn.initializers.zeros, (self.features,))
        rv = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = w * jax.lax.rsqrt(rv + self.eps)
        bias = b - rm * scale
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


def _precision(dtype) -> jax.lax.Precision:
    # See transformer.matmul_precision: f32 must mean real f32 on TPU.
    return (jax.lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          dtype=jnp.float32, name: str | None = None) -> nn.Conv:
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=_precision(dtype),
        name=name,
    )


class Bottleneck(nn.Module):
    """torchvision-style bottleneck block (1x1 reduce, 3x3, 1x1 expand)."""

    width: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.width * 4
        y = _conv(self.width, 1, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.width, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(self.width, 3, self.stride, self.dilation,
                  dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.width, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = _conv(out_ch, 1, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(out_ch, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            x = _conv(out_ch, 1, self.stride, dtype=self.dtype,
                      name="downsample_conv")(x)
            x = FrozenBatchNorm(out_ch, dtype=self.dtype,
                                name="downsample_bn")(x)
        return nn.relu(y + x)


_STAGE_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class StemConv(nn.Module):
    """The 7x7/s2 stem conv, computed via 2x2 space-to-depth.

    A 3-input-channel 7x7 conv contracts only 147 values with a lane
    occupancy of 3/128 — it dominates the whole ResNet encode on TPU
    (measured: ~26 of 29 ms for a 32x256x256 batch). Packing 2x2 pixel
    blocks into channels turns it into an exactly equivalent 4x4/s1 conv
    over 12 channels:

        out(i,j) = sum_{u,v in [0,7]} W8[u,v,c] * in(2i-4+u, 2j-4+v, c)
        with W8 = zero-pad(W7, 1 leading row/col)
        u = 2*bu + pu  =>  4x4 conv over blocks, channel (pu, pv, c)

    The stored parameter keeps the torchvision layout (7, 7, 3, 64) so the
    checkpoint converter is unaffected; the rearrangement happens at apply
    time (constant-folded by XLA).
    """

    features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, self.features))
        w8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w4 = w8.reshape(4, 2, 4, 2, 3, self.features)
        w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, self.features)

        b, h, w, c = x.shape
        xp = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            xp.astype(self.dtype), w4.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_precision(self.dtype))


class ResNet(nn.Module):
    """ResNet-50/101 trunk up to ``out_layer`` (NHWC).

    ``dilation`` replaces layer4's stride with dilation 2
    (reference backbone.py:104-106 replace_stride_with_dilation).
    """

    name_variant: str = "resnet50"
    out_layer: str = "layer3"
    dilation: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        blocks = _STAGE_BLOCKS[self.name_variant]
        x = StemConv(64, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        widths = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        dilations = [1, 1, 1, 1]
        if self.dilation:
            strides = (1, 2, 2, 1)
            dilations[3] = 2
        out_idx = int(self.out_layer[-1])  # "layer3" -> 3
        for stage in range(out_idx):
            num_blocks = blocks[stage]
            for i in range(num_blocks):
                x = Bottleneck(
                    width=widths[stage],
                    stride=strides[stage] if i == 0 else 1,
                    dilation=dilations[stage],
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{i}",
                )(x)
        return x


class SplitCanvasBackbone(nn.Module):
    """Run the trunk on each canvas half independently, re-join along width.

    Reference backbone.py:79-92; the two halves are folded into the batch
    dimension so the convs see one batch of 2B square images.
    """

    name_variant: str = "resnet50"
    out_layer: str = "layer3"
    dilation: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, canvas: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = canvas.shape
        assert (h, w) == (MAX_SIZE, 2 * MAX_SIZE), (
            f"canvas must be ({MAX_SIZE}, {2 * MAX_SIZE}), got {(h, w)}")
        halves = jnp.concatenate(
            [canvas[:, :, :MAX_SIZE, :], canvas[:, :, MAX_SIZE:, :]], axis=0)
        feats = ResNet(self.name_variant, self.out_layer, self.dilation,
                       dtype=self.dtype, name="body")(halves)
        left, right = feats[:b], feats[b:]
        return jnp.concatenate([left, right], axis=2)  # join along width
