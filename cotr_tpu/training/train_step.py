"""Data-parallel training step under jit.

Equivalent of the reference's ``train_batch`` inner loop
(cotr_trainer.py:121-154) — forward + cycle forward + backward + Adam — but
compiled once and sharded over the ``data`` mesh axis: the batch is split
across chips, parameters are replicated, and XLA inserts the gradient psum.
"""

from __future__ import annotations


from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from cotr_tpu.config import TrainConfig
from cotr_tpu.parallel.mesh import batch_sharding, replicated
from cotr_tpu.training.loss import cotr_loss
from cotr_tpu.training.optim import build_optimizer


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def _prep_image(image: jnp.ndarray) -> jnp.ndarray:
    """Batches may carry RAW uint8 canvases (4x less host->device traffic —
    the upload is the step bottleneck over slow links); ImageNet
    normalization then runs on device. float inputs pass through already
    normalized."""
    if image.dtype == jnp.uint8:
        from cotr_tpu.ops.canvas import normalize_canvas

        return normalize_canvas(image.astype(jnp.float32) / 255.0)
    return image


def batch_canvas(batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Resolve the training canvas from either batch layout:

    * ``image``: a ready (B, 256, 512, 3) canvas (uint8 or normalized float);
    * ``crop`` + ``h_mat``: device-side synthetic supervision — the B side
      is warped from the source crop INSIDE the jitted step
      (ops.canvas.canvas_from_crops_and_homographies), halving the
      host's per-sample synthesis work and the host->device bytes.
    """
    if "image" in batch and "cand" not in batch:
        return _prep_image(batch["image"])
    from cotr_tpu.ops.canvas import canvas_from_crops_and_homographies

    return canvas_from_crops_and_homographies(batch["crop"], batch["h_mat"],
                                              batch.get("photo"))


def batch_views(batch: Dict[str, jnp.ndarray], cfg: TrainConfig):
    """(canvas, queries, targets, weights) from any batch layout:

    * ``image`` + ``queries``/``targets``: host-synthesized supervision
      (weights None);
    * ``crop`` + ``h_mat`` [+ ``photo``]: synthetic device-warp layout;
    * ``cand`` + camera/depth fields: device-side MegaDepth supervision
      (data.device_synth) — correspondences are synthesized INSIDE the
      jitted step and invalid picks carry weight 0.
    """
    if "cand" in batch:
        from cotr_tpu.data.device_synth import synth_supervision_batch

        canvas, queries, targets, weights = synth_supervision_batch(
            batch, cfg.num_kp, cfg.bidirectional)
        return _prep_image(canvas), queries, targets, weights
    return (batch_canvas(batch), batch["queries"], batch["targets"], None)


def create_train_state(model, cfg: TrainConfig, rng,
                       sample_batch: Dict[str, jnp.ndarray]
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    one = {k: v[:1] for k, v in sample_batch.items()}
    canvas, queries, _, _ = batch_views(one, cfg)
    params = model.init(rng, canvas, queries)
    tx = build_optimizer(cfg, params["params"])
    opt_state = tx.init(params["params"])
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state), tx


def make_train_step(model, tx, cfg: TrainConfig,
                    mesh: Optional[Mesh] = None):
    """Returns train_step(state, batch, dropout_rng) -> (state, metrics).

    batch: {'image': (B, 256, 512, 3), 'queries': (B, Q, 2),
            'targets': (B, Q, 2)}; with a mesh, B is sharded across 'data'.
    """

    def loss_fn(p, batch, rng):
        canvas, queries, targets, weights = batch_views(batch, cfg)
        loss, metrics = cotr_loss(
            model, {"params": p}, canvas, queries, targets,
            cycle_consis=cfg.cycle_consis,
            bidirectional=cfg.bidirectional, train=True,
            rngs={"dropout": rng}, weights=weights)
        return loss, metrics

    def step_fn(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["params"], batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state,
                                     state.params["params"])
        new_params = optax.apply_updates(state.params["params"], updates)
        new_state = TrainState(state.step + 1, {"params": new_params}, new_opt)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    # State shardings are inherited from the caller's placement (replicated
    # for pure DP via parallel.replicate; tensor-parallel for a 2D mesh via
    # parallel.tp.transformer_param_shardings) — jit preserves them and
    # GSPMD inserts the collectives. The batch sharding is a pytree PREFIX:
    # every leaf (image or crop/h_mat layout) shards its leading batch axis.
    return jax.jit(
        step_fn,
        in_shardings=(None, bsh, repl),
        out_shardings=(None,
                       {"loss": repl, "corr_loss": repl, "cycle_loss": repl,
                        "pred": bsh, "target": bsh}),
        donate_argnums=(0,),
    )


def make_eval_step(model, cfg: TrainConfig, mesh: Optional[Mesh] = None):
    def eval_fn(params, batch):
        canvas, queries, targets, weights = batch_views(batch, cfg)
        pred = model.apply(params, canvas, queries)
        if weights is None:
            val = jnp.mean((pred - targets) ** 2)
        else:
            w = weights.astype(pred.dtype)[..., None]
            val = ((pred - targets) ** 2 * w).sum() / \
                jnp.maximum(w.sum() * pred.shape[-1], 1.0)
        return {"val_loss": val, "pred": pred}

    return jax.jit(eval_fn)
