"""Tensor-parallel parameter shardings for the transformer.

The model is ~18M params, so TP is not needed for capacity — it is exposed
for completeness and for latency scaling of the decode path (SURVEY.md §2.11:
"expose optional 2D mesh sharding of attention/FFN weights via pjit partition
specs"). Layout follows the standard Megatron pattern over a ('data',
'model') mesh:

* q/k/v projection kernels (d, d): output (head) dim sharded -> each model
  shard computes a head subset; biases sharded to match;
* out_proj kernel (d, d): input dim sharded -> XLA inserts the psum;
* FFN linear1 (d, ffn): output sharded; linear2 (ffn, d): input sharded;
* everything else (layernorms, backbone, head) replicated.

With these param shardings under jit, GSPMD propagates activation shardings
and inserts the two per-layer all-reduces over the 'model' axis (riding ICI).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(names, model_axis: str):
    leaf = names[-1]
    mod = names[-2] if len(names) >= 2 else ""
    if mod in ("q_proj", "k_proj", "v_proj", "linear1"):
        return P(None, model_axis) if leaf == "kernel" else P(model_axis)
    if mod in ("out_proj", "linear2"):
        return P(model_axis, None) if leaf == "kernel" else P()
    return P()


def transformer_param_shardings(params: Any, mesh: Mesh,
                                model_axis: str = "model") -> Any:
    """NamedSharding pytree for a COTRModel ``{'params': ...}`` tree."""

    def shard(path, _leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        if "transformer" in names:
            return NamedSharding(mesh, _spec_for_path(names, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(shard, params)


def make_2d_mesh(n_devices: int, model_parallel: int = 2,
                 axis_names=("data", "model")) -> Mesh:
    import numpy as np

    assert n_devices % model_parallel == 0
    devices = np.array(jax.devices()[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel)
    return Mesh(devices, axis_names)
