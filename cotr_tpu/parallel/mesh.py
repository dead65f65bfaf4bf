"""Device mesh + sharding helpers.

The reference is single-GPU with no distributed support (SURVEY.md §2.11:
torch.distributed imported but unused, models/misc.py:16). Scale-out here is
designed TPU-first: a 1-D ``data`` mesh over all chips for batch/data
parallelism (the model is ~18M params — replicated), with gradient psums
inserted by XLA under jit. Shardings are expressed with
``jax.sharding.NamedSharding`` so the same train step runs on 1 chip, a v5e
pod slice, or the CPU-simulated 8-device mesh used in tests.

The query axis of inference is embarrassingly parallel (no decoder query
self-attention), so inference scale-out shards the task batch the same way.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """device_put every array in a pytree with its batch axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_batch_multihost(batch: Any, mesh: Mesh,
                          axis_name: str = "data") -> Any:
    """Assemble a GLOBAL batch from per-host local shards (multi-host input
    pipeline; SURVEY.md §2.11): each host's loader produces its slice of the
    global batch; this stitches them into global arrays sharded over the
    mesh. On a single host this reduces to shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis_name)
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)
