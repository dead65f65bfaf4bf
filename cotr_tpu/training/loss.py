"""Training losses: correspondence MSE + cycle-consistency.

Replicates reference COTR/trainers/cotr_trainer.py:121-154:

* main loss: MSE(pred, target) over normalized canvas coords;
* bidirectional cycle loss: feed predictions back as queries, keep pairs
  whose round trip lands within 10/256 of the original query, add their MSE.
  Gradient flows through BOTH forwards (the reference does not detach pred);
* unidirectional variant: swap canvas halves, shift x by 0.5 on both legs
  (cotr_trainer.py:137-146).

Each training step therefore runs 2 full forwards + 1 backward, exactly like
the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from cotr_tpu.utils.constants import MAX_SIZE

CYCLE_THRESH = 10.0 / MAX_SIZE


def masked_mse(err_sq: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """torch mse_loss(x[mask], y[mask]) equivalent: mean of squared error
    over the selected (B, Q) vectors' elements; 0 when nothing selected."""
    mask_f = mask.astype(err_sq.dtype)[..., None]
    total = (err_sq * mask_f).sum()
    count = mask_f.sum() * err_sq.shape[-1]
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def cotr_loss(model, params, canvas, queries, targets, *,
              cycle_consis: bool = True, bidirectional: bool = True,
              train: bool = True, rngs: Dict[str, Any] | None = None,
              weights: jnp.ndarray | None = None
              ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (loss, metrics).

    ``weights`` (B, Q) optional per-query validity: device-synthesized
    supervision (data.device_synth) cannot re-draw samples with too few
    valid correspondences under fixed shapes, so invalid picks carry weight
    0 and both loss terms normalize by the weight sum."""
    def fwd(q):
        return model.apply(params, canvas, q, train=train,
                           rngs=rngs or {})

    pred = fwd(queries)
    if weights is None:
        corr_loss = jnp.mean((pred - targets) ** 2)
    else:
        w = weights.astype(pred.dtype)[..., None]
        corr_loss = ((pred - targets) ** 2 * w).sum() / \
            jnp.maximum(w.sum() * pred.shape[-1], 1.0)
    loss = corr_loss
    cycle_loss = jnp.zeros(())
    if cycle_consis and bidirectional:
        cycle = fwd(pred)
        mask = jnp.linalg.norm(cycle - queries, axis=-1) < CYCLE_THRESH
        if weights is not None:
            mask = mask & (weights > 0)
        cycle_loss = masked_mse((cycle - queries) ** 2, mask)
        loss = loss + cycle_loss
    elif cycle_consis:
        canvas_rev = jnp.concatenate(
            [canvas[:, :, MAX_SIZE:], canvas[:, :, :MAX_SIZE]], axis=2)
        q_rev = pred.at[..., 0].add(-0.5)
        cycle = model.apply(params, canvas_rev, q_rev, train=train,
                            rngs=rngs or {})
        cycle = cycle.at[..., 0].add(-0.5)
        mask = jnp.linalg.norm(cycle - queries, axis=-1) < CYCLE_THRESH
        if weights is not None:
            mask = mask & (weights > 0)
        cycle_loss = masked_mse((cycle - queries) ** 2, mask)
        loss = loss + cycle_loss
    metrics = {"loss": loss, "corr_loss": corr_loss,
               "cycle_loss": cycle_loss, "pred": pred, "target": targets}
    return loss, metrics
