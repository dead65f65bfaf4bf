"""Training loop: iteration-driven epochs, periodic validation, Orbax
checkpoint/resume, TensorBoard metrics.

Mirrors the reference runtime (COTR/trainers/base_trainer.py:66-107 +
cotr_trainer.py):

* epochs sized ceil(max_iter / len(loader)), stop at max_iter;
* validate every ``valid_iter`` iterations, save a rolling ``checkpoint``
  plus an iteration-stamped archive every 10*valid_iter
  (cotr_trainer.py:75-88);
* resume restores step/params/optimizer (cotr_trainer.py:165-186);
* TB: train loss scalar + pred/target histograms, val loss
  (cotr_trainer.py:156-163).
"""

from __future__ import annotations


import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cotr_tpu.config import COTRConfig, TrainConfig, compact_name, save_params_json
from cotr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cotr_tpu.training.train_step import (TrainState, create_train_state,
                                          make_eval_step, make_train_step)

#: batch keys consumed by the jitted steps, across all layouts (host canvas,
#: synthetic device-warp, device-synth MegaDepth — see train_step.batch_views)
KEEP_KEYS = ("image", "queries", "targets", "crop", "h_mat", "photo",
             "cand", "qdepth", "qscale", "kinv_nn", "c2w_nn", "proj_q",
             "flip", "skey")


class Trainer:
    def __init__(self, model, model_cfg: COTRConfig, train_cfg: TrainConfig,
                 train_loader: Callable[[], Iterable[Dict[str, np.ndarray]]],
                 val_loader: Optional[Callable[[], Iterable]] = None,
                 out_dir: Optional[str] = None, use_tensorboard: bool = True,
                 mesh=None):
        self.model = model
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        if mesh is not None:
            self.mesh = mesh
        else:
            ndev = train_cfg.num_devices or len(jax.devices())
            # the data axis must divide the global batch
            while train_cfg.batch_size % ndev:
                ndev -= 1
            self.mesh = make_mesh(ndev)
        self.out_dir = out_dir or os.path.join(
            train_cfg.out_dir, compact_name(model_cfg, train_cfg))
        os.makedirs(self.out_dir, exist_ok=True)
        save_params_json(os.path.join(self.out_dir, "params.json"),
                         model_cfg, train_cfg)

        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(self.out_dir, "tb"))
            except Exception:
                self._tb = None

        self._ckpt_dir = os.path.join(self.out_dir, "checkpoints")
        os.makedirs(self._ckpt_dir, exist_ok=True)

        self.state: Optional[TrainState] = None
        self._tx = None
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------- lifecycle

    def initialize(self, sample_batch: Dict[str, np.ndarray], seed: int = 0):
        rng = jax.random.PRNGKey(seed)
        self.state, self._tx = create_train_state(
            self.model, self.cfg, rng,
            jax.tree_util.tree_map(jnp.asarray, sample_batch))
        self.state = TrainState(*replicate(tuple(self.state), self.mesh))
        self._train_step = make_train_step(self.model, self._tx, self.cfg,
                                           self.mesh)
        self._eval_step = make_eval_step(self.model, self.cfg, self.mesh)

    # ----------------------------------------------------------- checkpoints

    #: checkpoint payload layout version; bumped on structural changes so a
    #: stale restore fails loudly instead of silently misassigning state
    CKPT_VERSION = 2

    def save_checkpoint(self, tag: str = "checkpoint"):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self._ckpt_dir, tag))
        ckptr = ocp.StandardCheckpointer()
        # opt_state saved as its FULL pytree (not flattened leaves): restore
        # checks the live optimizer's structure against the saved one, so a
        # changed optimizer construction raises instead of reshuffling moments
        payload = {
            "version": np.asarray(self.CKPT_VERSION),
            "step": np.asarray(self.state.step),
            "params": jax.tree_util.tree_map(np.asarray,
                                             self.state.params["params"]),
            "opt_state": jax.tree_util.tree_map(np.asarray,
                                                self.state.opt_state),
        }
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, tag: str = "checkpoint") -> bool:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self._ckpt_dir, tag))
        if not os.path.exists(path):
            return False
        ckptr = ocp.StandardCheckpointer()
        template = {
            "version": np.asarray(0),
            "step": np.asarray(self.state.step),
            "params": jax.tree_util.tree_map(np.asarray,
                                             self.state.params["params"]),
            "opt_state": jax.tree_util.tree_map(np.asarray,
                                                self.state.opt_state),
        }
        restored = ckptr.restore(path, template)
        version = int(restored["version"])
        if version != self.CKPT_VERSION:
            raise ValueError(
                f"checkpoint at {path} has layout version {version}, "
                f"this trainer writes {self.CKPT_VERSION}; refusing a "
                "structurally ambiguous restore")
        self.state = TrainState(jnp.asarray(restored["step"]),
                                {"params": restored["params"]},
                                restored["opt_state"])
        self.state = TrainState(*replicate(tuple(self.state), self.mesh))
        return True

    # -------------------------------------------------------------- training

    def validate(self) -> float:
        if self.val_loader is None:
            return float("nan")
        losses = []
        first = None
        for batch in self.val_loader():
            batch = {k: batch[k] for k in KEEP_KEYS if k in batch}
            jbatch = shard_batch(
                jax.tree_util.tree_map(jnp.asarray, batch), self.mesh)
            out = self._eval_step(self.state.params, jbatch)
            losses.append(float(out["val_loss"]))
            if first is None and "queries" in batch and "targets" in batch:
                # TB corr renderings need host-known queries/targets; the
                # device-synth layout synthesizes them inside the step
                first = (batch, np.asarray(out["pred"]))
        val = float(np.mean(losses)) if losses else float("nan")
        if self._tb is not None and np.isfinite(val):
            self._tb.add_scalar("loss/val", val, int(self.state.step))
            if first is not None:
                # GT-vs-pred correspondence renderings
                # (reference cotr_trainer.py:104-119)
                from cotr_tpu.training.tb import draw_corrs

                batch, pred = first
                if "image" in batch:
                    img = np.asarray(batch["image"][:4])
                else:
                    from cotr_tpu.ops.canvas import (
                        canvas_from_crops_and_homographies,
                        denormalize_canvas)
                    img = np.asarray(denormalize_canvas(
                        canvas_from_crops_and_homographies(
                            jnp.asarray(batch["crop"][:4]),
                            jnp.asarray(batch["h_mat"][:4]))))
                    img = (img * 255).clip(0, 255).astype(np.uint8)
                q = np.asarray(batch["queries"][:4])
                gt = np.concatenate([q, np.asarray(batch["targets"][:4])], -1)
                pd = np.concatenate([q, pred[:4]], -1)
                step_i = int(self.state.step)
                self._tb.add_image("image/gt_corrs",
                                   draw_corrs(img, gt, (0, 255, 0))[0],
                                   step_i, dataformats="HWC")
                self._tb.add_image("image/pred_corrs",
                                   draw_corrs(img, pd, (255, 0, 0))[0],
                                   step_i, dataformats="HWC")
        return val

    def train(self, resume: bool = False):
        assert self.state is not None, "call initialize() first"
        if resume:
            self.load_checkpoint()
        rng = jax.random.PRNGKey(self.cfg.seed + 1)
        step = int(self.state.step)
        t0 = time.time()
        while step < self.cfg.max_iter:
            for batch in self.train_loader():
                if step >= self.cfg.max_iter:
                    break
                rng, sub = jax.random.split(rng)
                batch = {k: batch[k] for k in KEEP_KEYS if k in batch}
                batch = shard_batch(
                    jax.tree_util.tree_map(jnp.asarray, batch), self.mesh)
                self.state, metrics = self._train_step(self.state, batch, sub)
                step += 1
                if (self._tb is not None and self.cfg.tb_iter > 0
                        and step % self.cfg.tb_iter == 0):
                    # scalar + pred/target histograms
                    # (reference cotr_trainer.py:156-163)
                    self._tb.add_scalar("loss/train", float(metrics["loss"]),
                                        step)
                    self._tb.add_scalar("loss/cycle",
                                        float(metrics["cycle_loss"]), step)
                    self._tb.add_histogram("distribution/pred",
                                           np.asarray(metrics["pred"]), step)
                    # device-synth batches carry no host 'targets'; the
                    # jitted step reports the synthesized ones instead
                    self._tb.add_histogram("distribution/target",
                                           np.asarray(metrics["target"]),
                                           step)
                if step % self.cfg.valid_iter == 0:
                    val = self.validate()
                    self.save_checkpoint()
                    if step % (10 * self.cfg.valid_iter) == 0:
                        self.save_checkpoint(f"ckpt_{step}")
                    dt = time.time() - t0
                    print(f"iter {step}: loss={float(metrics['loss']):.5f} "
                          f"val={val:.5f} ({dt:.0f}s)")
        return self.state
