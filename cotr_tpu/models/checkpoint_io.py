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
  saved directly with ``StandardCheckpointer``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def load_params(path: str, cfg):
    """Load inference params from ``path`` in any supported layout.

    Returns a ``{"params": ...}`` pytree of jnp arrays ready for
    ``model.apply`` / ``ModelRunner``.
    """
    if path.endswith((".pth", ".tar")):
        from cotr_tpu.models.torch_convert import load_torch_checkpoint

        params = load_torch_checkpoint(path, cfg)
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
