from cotr_tpu.models.cotr import COTRModel, CorrHead, build_model
from cotr_tpu.models.position import (image_position_embedding,
                                      nerf_positional_encoding)
from cotr_tpu.models.resnet import FrozenBatchNorm, ResNet, SplitCanvasBackbone
from cotr_tpu.models.transformer import MultiHeadAttention, Transformer

__all__ = [
    "COTRModel",
    "CorrHead",
    "build_model",
    "image_position_embedding",
    "nerf_positional_encoding",
    "FrozenBatchNorm",
    "ResNet",
    "SplitCanvasBackbone",
    "MultiHeadAttention",
    "Transformer",
]
