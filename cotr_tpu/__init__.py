"""COTR-TPU: a TPU-native correspondence-transformer framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of ubc-vision/COTR
("COTR: Correspondence Transformer for Matching Across Images", ICCV 2021):
functional image correspondence via a DETR-style encoder-decoder over a
side-by-side two-image canvas, with accuracy from recursive zoom-in.

Design stance (TPU-first, not a port):
  * fixed static shapes everywhere: the canvas is always (256, 512, 3), query
    counts are padded to buckets, zoom recursion is a fixed-depth ``lax.scan``;
  * decoder queries are independent (the reference decoder has no query
    self-attention, see /root/reference COTR/models/transformer.py:162-201),
    so sparse/dense/zoom inference is one batched vectorized program;
  * data parallelism via ``jax.sharding`` meshes; no task-object scheduler.
"""

import os as _os

# Platform override that works even when the interpreter's sitecustomize
# imported jax before env vars could act (it captures JAX_PLATFORMS at
# startup): COTR_TPU_PLATFORM=cpu pins the LIVE jax config. Useful when the
# TPU attachment is down — initializing a dead backend hangs silently.
_plat = _os.environ.get("COTR_TPU_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

from cotr_tpu.config import COTRConfig, InferenceConfig, TrainConfig
from cotr_tpu.models import COTRModel, build_model

__version__ = "0.1.0"

__all__ = [
    "COTRConfig",
    "InferenceConfig",
    "TrainConfig",
    "COTRModel",
    "build_model",
    "__version__",
]
