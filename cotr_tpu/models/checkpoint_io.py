"""Checkpoint loading for inference entry points.

One loader for every on-disk layout a user can point an engine at
(the reference's single path is ``utils.safe_load_weights`` of the released
``checkpoint.pth.tar``, utils/utils.py:164-193):

* torch ``.pth`` / ``.pth.tar`` — the reference release format, converted
  tensor-by-tensor (``torch_convert.load_torch_checkpoint``);
* Trainer payloads — ``{version, step, params, opt_state}`` as written by
  ``training.trainer.Trainer.save_checkpoint`` (the ``params`` entry is the
  inner ``params`` collection);
* raw orbax trees — a ``model.init``-shaped ``{"params": ...}`` pytree
  saved directly with ``StandardCheckpointer``;
* ``.npz`` weight files — the repo's committable release format
  (``save_params_npz``): flat ``a/b/c`` keys, float arrays stored as
  bfloat16 bit patterns (bit-exact w.r.t. the bf16 compute the model runs
  in; half the size of fp32, git-friendly single file).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(params, path: str, dtype: str = "bfloat16") -> None:
    """Write a ``{"params": ...}`` pytree as one compressed ``.npz``.

    Float leaves are stored as bfloat16 bit patterns (uint16 views) when
    ``dtype='bfloat16'`` — exact for a model whose compute dtype is bf16 —
    or as float32. Non-float leaves keep their dtype."""
    import ml_dtypes

    flat = _flatten(params)
    store = {}
    bf16_keys = []
    for k, v in flat.items():
        v = np.asarray(v)
        if np.issubdtype(v.dtype, np.floating) or v.dtype == ml_dtypes.bfloat16:
            # every float dtype goes through the bit-pattern path: np.load
            # returns raw ml_dtypes leaves as void '|V2', which is
            # unloadable, so they must never be stored directly
            if dtype == "bfloat16":
                store[k] = v.astype(ml_dtypes.bfloat16).view(np.uint16)
                bf16_keys.append(k)
            else:
                store[k] = v.astype(np.float32)
        else:
            store[k] = v
    store["__bf16_keys__"] = np.asarray(json.dumps(bf16_keys))
    np.savez_compressed(path, **store)


def _load_params_npz(path: str):
    import ml_dtypes

    data = np.load(path, allow_pickle=False)
    bf16_keys = set(json.loads(str(data["__bf16_keys__"])))
    flat = {}
    for k in data.files:
        if k == "__bf16_keys__":
            continue
        v = data[k]
        if k in bf16_keys:
            v = v.view(ml_dtypes.bfloat16).astype(np.float32)
        flat[k] = v
    return _unflatten(flat)


def load_params(path: str, cfg):
    """Load inference params from ``path`` in any supported layout.

    Returns a ``{"params": ...}`` pytree of jnp arrays ready for
    ``model.apply`` / ``ModelRunner``.
    """
    if path.endswith((".pth", ".tar")):
        from cotr_tpu.models.torch_convert import load_torch_checkpoint

        params = load_torch_checkpoint(path, cfg)
    elif path.endswith(".npz"):
        tree = _load_params_npz(path)
        # wrap only when the tree is not already a variables dict (a top
        # level containing 'params' plus e.g. 'batch_stats' must not be
        # double-wrapped)
        params = tree if "params" in tree else {"params": tree}
    else:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        if isinstance(restored, dict) and "opt_state" in restored:
            # Trainer payload: params is the inner collection. Honor the
            # same layout-version gate Trainer.load_checkpoint enforces —
            # a silently reinterpreted stale payload is worse than an error.
            from cotr_tpu.training.trainer import Trainer

            version = int(restored.get("version", -1))
            if version != Trainer.CKPT_VERSION:
                raise ValueError(
                    f"checkpoint at {path} has layout version {version}; "
                    f"this build reads {Trainer.CKPT_VERSION}")
            params = {"params": restored["params"]}
        elif isinstance(restored, dict) and set(restored) == {"params"}:
            params = restored
        else:
            raise ValueError(
                f"unrecognized checkpoint layout at {path}: "
                f"{type(restored).__name__} with keys "
                f"{sorted(restored) if isinstance(restored, dict) else '-'}")
    return jax.tree_util.tree_map(jnp.asarray, params)
