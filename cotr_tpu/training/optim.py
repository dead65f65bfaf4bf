"""Optimizer construction with the reference's parameter-group policy.

Reference train_cotr.py:49-57 builds Adam groups: transformer, corr_embed,
input_proj (and the param-free query_proj) at ``learning_rate``; the backbone
at ``lr_backbone`` only when > 0. Additionally (backbone.py:63-66) only
layer2/3/4 backbone weights ever train, and BatchNorm statistics/affine are
frozen always (FrozenBatchNorm). Here those rules become an optax
multi_transform over parameter-path labels, plus ``apply_if_finite`` to
reproduce the NaN-loss skip (cotr_trainer.py:147-151).
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from cotr_tpu.config import TrainConfig

_TRAINABLE_BACKBONE_STAGES = ("layer2", "layer3", "layer4")


def _is_frozen_bn_param(path) -> bool:
    names = [getattr(k, "key", str(k)) for k in path]
    leaf = names[-1]
    if leaf in ("running_mean", "running_var"):
        return True
    if leaf in ("weight", "bias") and len(names) >= 2:
        mod = names[-2]
        return mod.startswith("bn") or mod.endswith("_bn")
    return False


def param_labels(params: Any, lr_backbone: float) -> Any:
    def label(path, _leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        if "backbone" in names:
            if _is_frozen_bn_param(path):
                return "frozen"
            if lr_backbone <= 0:
                return "frozen"
            in_trainable_stage = any(
                any(n.startswith(stage) for stage in _TRAINABLE_BACKBONE_STAGES)
                for n in names)
            return "backbone" if in_trainable_stage else "frozen"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def _group_lr(cfg: TrainConfig, base: float):
    """Base lr or a cosine decay to base*lr_final_frac over lr_decay_steps.

    The schedule rides the Adam count inside opt_state, so Orbax resume
    continues it mid-curve; warm-starting params with a fresh opt_state
    restarts it (the intended behavior for a new decay run)."""
    if cfg.lr_schedule == "cosine" and cfg.lr_decay_steps > 0:
        return optax.cosine_decay_schedule(base, cfg.lr_decay_steps,
                                           alpha=cfg.lr_final_frac)
    assert cfg.lr_schedule in ("constant", "cosine"), cfg.lr_schedule
    return base


def build_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    labels = param_labels(params, cfg.lr_backbone)
    tx = optax.multi_transform(
        {
            "main": optax.adam(_group_lr(cfg, cfg.learning_rate)),
            "backbone": optax.adam(_group_lr(cfg, max(cfg.lr_backbone,
                                                      1e-30))),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    # NaN/Inf losses skip the update (cotr_trainer.py:147-151); a long run of
    # non-finite steps still raises through apply_if_finite's counter.
    return optax.apply_if_finite(tx, max_consecutive_errors=100)
