"""Batched recursive-zoom refinement as a fixed-depth ``lax.scan``.

TPU-native inversion of the reference's task-object scheduler
(COTR/inference/refinement_task.py + sparse_engine.py:25-56): instead of
Python ``RefinementTask`` objects each producing a PIL crop per step, ALL
tasks advance through the zoom schedule in lockstep; each scan step

  1. computes every task's source/target patch boxes on device
     (get_patch_centered_at semantics, inference_helper.py:78-102);
  2. gathers+resizes all crops from pre-built image pyramids
     (anti-aliased, replacing the per-task PIL resize,
     refinement_task.py:117-118);
  3. builds the (T, 256, 512, 3) canvas batch, runs ONE model forward;
  4. denormalizes predictions into target-image pixels
     (scale_to_loc, refinement_task.py:145-151).

Zoom depth and task count are static; per-pair image sizes enter as dynamic
scalars so one compilation serves every image pair with the same padded
bucket shape.

Semantics notes vs the reference:
* ``converge_iters`` extra iterations run at the final zoom with the
  reference's EXACT convergence rule (refinement_task.py:160-182 +
  find_prediction_loop, inference_helper.py:22-28): per-task history of
  final-zoom predictions is kept in the scan carry; on the first exact
  revisit the prediction loop [first match .. previous] is averaged and the
  task freezes; tasks reaching the iteration cap freeze on their last value
  (still loop-averaged if the cap step itself revisits).
* The returned history has ONE ROW PER ZOOM LEVEL (the final row being the
  converged/loop-averaged value), exactly like the reference's
  ``loc_history`` (refinement_task.py:43,179) which feeds the std filter.
* Patch sizes: size = 2 * floor(short * clip(scale,0,1) / 2), upper-left
  clamped inside the image — bit-identical to the reference for positive
  coordinates.
"""

from __future__ import annotations

import functools
from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cotr_tpu.ops.canvas import normalize_canvas
from cotr_tpu.ops.sampling import crop_and_resize_matmul
from cotr_tpu.utils.constants import BASE_ZOOM, MAX_SIZE


class RefineState(NamedTuple):
    loc_to: jnp.ndarray      # (T, 2) current target estimate, pixels
    frozen: jnp.ndarray      # (T,) bool — converged at final zoom
    hist: jnp.ndarray        # (C, T, 2) final-zoom prediction history
                             # (loc_to_at_zoom, refinement_task.py:42,159)


def patch_box(pos: jnp.ndarray, scale: jnp.ndarray, h: jnp.ndarray,
              w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Square crop of side 2*floor(short*clip(scale)/2) centered at pos,
    shifted to lie inside the image (inference_helper.py:78-102).

    pos (..., 2) float pixels; h, w scalars. Returns (x0, y0, size) floats.
    """
    short = jnp.minimum(h, w).astype(jnp.float32)
    size = jnp.floor(short * jnp.clip(scale, 0.0, 1.0) / 2.0) * 2.0
    half = jnp.floor(size / 2.0)
    # int() truncation in the reference == floor for the positive coords that
    # survive its subsequent clamping
    lu_x = jnp.floor(pos[..., 0] - half)
    lu_y = jnp.floor(pos[..., 1] - half)
    lu_x = jnp.clip(lu_x, 0.0, w.astype(jnp.float32) - size)
    lu_y = jnp.clip(lu_y, 0.0, h.astype(jnp.float32) - size)
    return lu_x, lu_y, size


def zoom_schedule(zoom_ins: Sequence[float], converge_iters: int) -> np.ndarray:
    """Per-step zoom values: each level once, the last level repeated
    ``converge_iters`` times total (refinement_task.py:160-170)."""
    zooms = list(zoom_ins) + [zoom_ins[-1]] * (converge_iters - 1)
    return np.asarray(zooms, dtype=np.float32)


def _refine_scan(apply_fn, params, img_a: jnp.ndarray, img_b: jnp.ndarray,
                 hw_a: jnp.ndarray, hw_b: jnp.ndarray,
                 loc_from: jnp.ndarray, loc_to0: jnp.ndarray,
                 s_from: jnp.ndarray, s_to: jnp.ndarray,
                 zooms: jnp.ndarray, final_start: int,
                 crop_dtype=jnp.float32):
    """Device-side refinement over ``zooms`` steps.

    apply_fn(params, canvas, queries) -> (T, 1, 2).
    Returns the per-zoom-LEVEL history (len(zoom_ins), T, 2) — one row per
    level, final row converged/loop-averaged (loc_history semantics,
    refinement_task.py:179) — plus the final state.
    """
    t = loc_from.shape[0]
    h_a, w_a = hw_a[0], hw_a[1]
    h_b, w_b = hw_b[0], hw_b[1]
    # converge iterations available at the final zoom (static)
    c_iters = int(zooms.shape[0]) - final_start

    def step(state: RefineState, inputs):
        zoom, step_idx = inputs
        x0f, y0f, size_f0 = patch_box(loc_from, s_from * zoom, h_a, w_a)
        x0t, y0t, size_t0 = patch_box(state.loc_to, s_to * zoom, h_b, w_b)
        size_f = jnp.broadcast_to(size_f0, x0f.shape)
        size_t = jnp.broadcast_to(size_t0, x0t.shape)

        boxes_from = jnp.stack([x0f, y0f, size_f, size_f], axis=-1)
        boxes_to = jnp.stack([x0t, y0t, size_t, size_t], axis=-1)
        # PIL-exact anti-aliased crops as MXU matmuls
        crops_a = crop_and_resize_matmul(img_a, boxes_from, MAX_SIZE,
                                         compute_dtype=crop_dtype)
        crops_b = crop_and_resize_matmul(img_b, boxes_to, MAX_SIZE,
                                         compute_dtype=crop_dtype)
        canvas = normalize_canvas(
            jnp.concatenate([crops_a, crops_b], axis=2))

        # query: loc_from in patch_from-local canvas coords
        # (refinement_task.py:110)
        qx = (loc_from[:, 0] - x0f) / (2.0 * size_f)
        qy = (loc_from[:, 1] - y0f) / size_f
        queries = jnp.stack([qx, qy], axis=-1)[:, None, :]  # (T, 1, 2)

        pred = apply_fn(params, canvas, queries)[:, 0, :]  # (T, 2)

        # denormalize (scale_to_loc, refinement_task.py:145-151)
        new_x = (pred[:, 0] - 0.5) * 2.0 * size_t + x0t
        new_y = pred[:, 1] * size_t + y0t
        new_loc = jnp.stack([new_x, new_y], axis=-1)

        # --- final-zoom convergence (refinement_task.py:160-182) ---------
        # kf = iteration index within the final zoom; hist[j] holds the
        # j-th final-zoom prediction (loc_to_at_zoom).
        at_final = step_idx >= final_start
        kf = step_idx - final_start
        jidx = jnp.arange(c_iters)
        valid_j = (jidx < kf)[:, None]                        # (C, 1)
        # exact-equality revisit: new_loc == some earlier final-zoom loc
        eq = jnp.all(state.hist == new_loc[None], axis=-1) & valid_j  # (C, T)
        has_loop = jnp.any(eq, axis=0)                        # (T,)
        # find_prediction_loop (inference_helper.py:22-28): average
        # hist[first_match .. kf-1]
        j_start = jnp.argmax(eq, axis=0)                      # first match
        loop_mask = (jidx[:, None] >= j_start[None, :]) & valid_j  # (C, T)
        cnt = jnp.maximum(loop_mask.sum(axis=0), 1)
        loop_mean = (jnp.where(loop_mask[..., None], state.hist, 0.0)
                     .sum(axis=0) / cnt[:, None].astype(state.hist.dtype))
        converged_val = jnp.where(has_loop[:, None], loop_mean, new_loc)
        freeze_now = at_final & ~state.frozen & (has_loop | (kf == c_iters - 1))

        out_loc = jnp.where(
            state.frozen[:, None], state.loc_to,
            jnp.where(freeze_now[:, None], converged_val, new_loc))
        # record the raw prediction in the final-zoom history
        write = (jidx[:, None] == kf) & (at_final & ~state.frozen)[None, :]
        new_hist = jnp.where(write[..., None], new_loc[None], state.hist)
        new_state = RefineState(loc_to=out_loc,
                                frozen=state.frozen | freeze_now,
                                hist=new_hist)
        return new_state, out_loc

    init = RefineState(loc_to=loc_to0,
                       frozen=jnp.zeros((t,), bool),
                       hist=jnp.full((c_iters, t, 2), jnp.inf,
                                     loc_to0.dtype))
    steps = jnp.arange(zooms.shape[0], dtype=jnp.int32)
    final, per_step = jax.lax.scan(step, init, (zooms, steps))
    # per-level history: non-final levels emit exactly one step each;
    # the final level's entry is the converged value.
    history = jnp.concatenate([per_step[:final_start],
                               final.loc_to[None]], axis=0)
    return history, final


class BatchRefiner:
    """Compiles and caches the refinement scan per (T, image-bucket) shape.

    Images are padded to multiples of ``bucket`` so one compilation serves
    many pairs; true extents travel as dynamic scalars and crops are clamped
    inside them, so padding is never sampled.
    """

    def __init__(self, runner, bucket: int = 256,
                 crop_dtype=jnp.float32, mesh=None):
        self.runner = runner
        self.bucket = bucket

        model = runner.model

        def refine(params, img_a, img_b, hw_a, hw_b, loc_from, loc_to0,
                   s_from, s_to, zooms, final_start):
            def apply_fn(p, canvas, queries):
                return model.apply(p, canvas, queries)
            return _refine_scan(apply_fn, params, img_a, img_b, hw_a, hw_b,
                                loc_from, loc_to0, s_from, s_to, zooms,
                                final_start, crop_dtype=crop_dtype)

        if mesh is None:
            self._refine = jax.jit(refine, static_argnames=("final_start",))
        else:
            # pjit rejects kwargs when in_shardings is given, so final_start
            # becomes positional (static_argnums) in the mesh path
            # multi-chip scan path (SURVEY §2.11 query-axis plan): the task
            # axis is embarrassingly parallel — shard it over the mesh's
            # "data" axis, replicate images/params/scalars. Task counts are
            # already padded to task_bucket multiples by the engine, so the
            # axis divides any power-of-two mesh.
            from jax.sharding import NamedSharding, PartitionSpec as P

            tsh = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            hist_sh = NamedSharding(mesh, P(None, "data"))
            jitted = jax.jit(
                refine, static_argnums=(10,),
                in_shardings=(None, repl, repl, repl, repl, tsh, tsh,
                              repl, repl, repl),
                out_shardings=(hist_sh,
                               RefineState(loc_to=tsh, frozen=tsh,
                                           hist=hist_sh)))

            def call(params, img_a, img_b, hw_a, hw_b, loc_from, loc_to0,
                     s_from, s_to, zooms, final_start):
                return jitted(params, img_a, img_b, hw_a, hw_b, loc_from,
                              loc_to0, s_from, s_to, zooms, final_start)

            self._refine = call

    def _pad_to_bucket(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        hp = -(-h // self.bucket) * self.bucket
        wp = -(-w // self.bucket) * self.bucket
        if (hp, wp) == (h, w):
            return img
        out = np.zeros((hp, wp) + img.shape[2:], img.dtype)
        out[:h, :w] = img
        return out

    def prepare_image(self, img: np.ndarray) -> Tuple[Any, Tuple[int, int]]:
        """uint8 or float HWC image -> (padded [0,1] device image, (h, w)).

        uint8 uploads as uint8 (4x less tunnel traffic) and converts on
        device. (Name kept from the gather-pyramid era; crops are now
        exact-PIL matmuls over the level-0 image.)"""
        h, w = img.shape[:2]
        img = np.asarray(img)
        padded = self._pad_to_bucket(img)
        dev = jnp.asarray(padded)
        if padded.dtype == np.uint8:
            dev = dev.astype(jnp.float32) / 255.0
        else:
            dev = dev.astype(jnp.float32)
            if float(img.max()) > 2.0:
                dev = dev / 255.0
        return dev, (h, w)



    def refine(self, img_a, hw_a, img_b, hw_b,
               loc_from: np.ndarray, loc_to0: np.ndarray,
               s_from: float, s_to: float,
               zoom_ins: Sequence[float], converge_iters: int = 1
               ) -> np.ndarray:
        """Run the full zoom schedule for T tasks.

        Returns the per-zoom-level loc_to history (len(zoom_ins), T, 2) as
        numpy; the final row is the converged (loop-averaged) estimate.
        """
        zooms = zoom_schedule(zoom_ins, converge_iters)
        history, _ = self._refine(
            self.runner.params, img_a, img_b,
            jnp.asarray(hw_a, jnp.int32), jnp.asarray(hw_b, jnp.int32),
            jnp.asarray(loc_from, jnp.float32),
            jnp.asarray(loc_to0, jnp.float32),
            jnp.float32(s_from), jnp.float32(s_to),
            jnp.asarray(zooms), final_start=len(zoom_ins) - 1)
        return np.asarray(history)
