"""Optimizer-state sharding: moments follow params, optionally ZeRO-1.

The reference has no distributed training at all (SURVEY.md §2.11); this
closes the round-1 gap where tensor-parallel *parameters* were sharded but
Adam moments stayed replicated. Two layouts:

* moments-follow-params: every optimizer-state leaf that mirrors a parameter
  (Adam mu/nu inside optax.multi_transform/apply_if_finite wrappers) gets the
  parameter's own NamedSharding — TP-sharded params get TP-sharded moments.
* ZeRO-1 (``zero1_axis='data'``): moments of *replicated* params are
  additionally sharded across the data axis on their largest divisible dim.
  Under jit, XLA then computes the elementwise Adam update sharded and
  all-gathers the updates once per step (the ZeRO-1 communication pattern) —
  no manual collectives.

Matching is structural: optax wraps moment trees so that parameter paths
appear as path *suffixes* (e.g. ``inner_state.inner_states.main.0.mu.
transformer.enc0...kernel``); leaves are matched to parameters by the longest
path suffix with an identical shape. Scalars and unmatched leaves (counts,
MaskedNodes) are replicated.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _names(path) -> tuple:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return tuple(out)


def _is_replicated(sharding: NamedSharding) -> bool:
    return all(s is None for s in sharding.spec)


def _zero1_spec(shape, axis: str, axis_size: int) -> P:
    """Shard the largest dim divisible by the axis size; replicate if none."""
    if not shape:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] >= axis_size and shape[d] % axis_size == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def opt_state_shardings(opt_state: Any, params: Any, param_shardings: Any,
                        mesh: Mesh,
                        zero1_axis: Optional[str] = None) -> Any:
    """NamedSharding pytree for ``opt_state``.

    params / param_shardings: the parameter pytree and its sharding pytree
    (e.g. from ``parallel.tp.transformer_param_shardings``).
    """
    by_path = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        sh = param_shardings
        for k in path:
            key = getattr(k, "key", getattr(k, "idx", None))
            sh = sh[key]
        by_path[_names(path)] = (np.shape(leaf), sh)

    repl = NamedSharding(mesh, P())
    axis_size = dict(mesh.shape).get(zero1_axis, 1) if zero1_axis else 1

    def shard(path, leaf):
        shape = np.shape(leaf)
        if not shape:
            return repl
        names = _names(path)
        for start in range(len(names)):
            hit = by_path.get(names[start:])
            if hit is not None and hit[0] == shape:
                param_sh = hit[1]
                if (zero1_axis and axis_size > 1
                        and _is_replicated(param_sh)):
                    return NamedSharding(
                        mesh, _zero1_spec(shape, zero1_axis, axis_size))
                return param_sh
        return repl

    return jax.tree_util.tree_map_with_path(shard, opt_state)


def shard_opt_state(opt_state: Any, params: Any, param_shardings: Any,
                    mesh: Mesh, zero1_axis: Optional[str] = None) -> Any:
    """device_put the optimizer state with `opt_state_shardings`."""
    shardings = opt_state_shardings(opt_state, params, param_shardings, mesh,
                                    zero1_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), opt_state, shardings)
