"""SparseEngine: reference-compatible sparse correspondence API, TPU-batched.

Mirrors ``COTR/inference/sparse_engine.py`` behaviorally — same seeding rules,
thresholds, filters and return conventions — but the execution model is
inverted for TPU: there are no task objects or dynamic batches. Seeding is
vectorized numpy on the dense-pass output; refinement advances ALL tasks
through the zoom schedule in lockstep inside one compiled ``lax.scan``
(see cotr_tpu/inference/refine.py). The reference's ``FasterSparseEngine``
exists only to amortize per-task Python/PIL work (sparse_engine.py:267-427);
here that amortization is the default execution model, so a separate class is
unnecessary — ``SparseEngine`` IS the fast path (an alias is provided for API
compatibility).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from cotr_tpu.inference.dense import dense_flow, dense_pass, to_square_patches
from cotr_tpu.inference.refine import BatchRefiner
from cotr_tpu.inference.runner import ModelRunner
from cotr_tpu.ops.sampling import resize_bilinear
from cotr_tpu.utils.constants import (BASE_ZOOM, THRESHOLD_AREA,
                                      THRESHOLD_PIXELS_RELATIVE,
                                      THRESHOLD_SPARSE)
import jax.numpy as jnp


def _to_float01(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    img = img.astype(np.float32)
    return img / 255.0 if img.max() > 2.0 else img


def relative_scales(area_a: float, area_b: float) -> Tuple[float, float]:
    """(s_from, s_to) from confident-area estimates
    (refinement_task.py:25-30); degenerate zero areas (e.g. an untrained
    model yields no confident pixels) fall back to equal scales instead of
    the reference's NaN."""
    if area_a <= 0 or area_b <= 0:
        return BASE_ZOOM, BASE_ZOOM
    if area_a < area_b:
        return BASE_ZOOM, BASE_ZOOM * float(np.sqrt(area_b / area_a))
    return BASE_ZOOM * float(np.sqrt(area_a / area_b)), BASE_ZOOM


def stretch_to_square(img: np.ndarray) -> np.ndarray:
    """Stretch to a max(h,w) square (reference capture.py:123-125).

    Host-side PIL, exactly like the reference — megapixel device round
    trips are slower than PIL over this environment's ~30 MB/s tunnel."""
    import PIL.Image

    size = max(img.shape[:2])
    if img.dtype == np.uint8:
        return np.array(PIL.Image.fromarray(img).resize(
            (size, size), resample=PIL.Image.BILINEAR))
    from cotr_tpu.inference.dense import _resize_field_host

    return _resize_field_host(np.asarray(img, np.float32), (size, size))


def _resize_field(field: np.ndarray, shape_hw: Tuple[int, int]) -> np.ndarray:
    from cotr_tpu.inference.dense import _resize_field_host

    return _resize_field_host(np.asarray(field, np.float32), shape_hw)


class SparseEngine:
    """Drop-in equivalent of the reference SparseEngine
    (sparse_engine.py:17-264).

    Parameters
    ----------
    runner: ModelRunner wrapping (model, params).
    batch_size: max tasks refined per device dispatch (tasks beyond this are
        chunked; unlike the reference this is a throughput knob, not a
        scheduling unit).
    mode: 'stretching' (non-square images stretched square for the seed pass)
        or 'tile' (patch tiling), as in the reference.
    task_bucket: task counts are padded up to a multiple of this to bound
        recompilation.
    seed: RNG seed for the confidence-masked random seeding
        (sparse_engine.py:148-166), kept deterministic for reproducibility.
    """

    def __init__(self, runner: ModelRunner, batch_size: int = 256,
                 mode: str = "stretching", task_bucket: int = 256,
                 image_bucket: int = 256, seed: int = 0, crop_dtype=None,
                 mesh=None, seed_stride: int = 1):
        # batch_size bounds canvases per device dispatch: each canvas costs
        # ~8 MB of encoder attention temps per layer (f32), so very large
        # batches exhaust HBM with no throughput benefit
        assert mode in ("stretching", "tile")
        # dense seed-pass grid stride: 1 = the reference's full 131k-query
        # grid (exact parity); s > 1 decodes 1/s^2 of the grid and
        # upsamples — for multipair workloads with few queries per pair the
        # full-grid decode was 82% of wall (evals/triage_multipair_r5.json)
        # and the refinement levels correct the coarser seeds
        from cotr_tpu.utils.constants import MAX_SIZE
        if seed_stride < 1 or MAX_SIZE % seed_stride:
            raise ValueError(
                f"seed_stride must divide the {MAX_SIZE}-px canvas half, "
                f"got {seed_stride}")
        self.seed_stride = seed_stride
        self.runner = runner
        self.batch_size = batch_size
        self.mode = mode
        self.task_bucket = task_bucket
        # crops in the model's compute dtype: the PIL-filter matmuls over
        # megapixel sources are a large share of refinement FLOPs, and fp32
        # crops feeding a bf16 model waste 4x MXU throughput
        self.crop_dtype = crop_dtype if crop_dtype is not None else \
            jnp.dtype(getattr(getattr(runner.model, "cfg", None), "dtype",
                              "float32"))
        # mesh: shard the refinement scan's task axis across devices
        # (multi-chip inference for the default engine; the grouped engine
        # shards its squad axis the same way)
        self.refiner = BatchRefiner(runner, bucket=image_bucket,
                                    crop_dtype=self.crop_dtype, mesh=mesh)
        self.rng = np.random.RandomState(seed)
        self.total_tasks = 0
        # opt-in failure diagnostics (tools/diagnose_tail.py): when True,
        # each cotr_corr_multiscale call stores its tasks' full zoom
        # histories + conclude verdicts in ``last_diag`` so error tails can
        # be classified (seed miss vs zoom divergence vs filter miss)
        self.collect_diagnostics = False
        self.last_diag = None
        # zoom scale for cycle_select's reverse check (None = the schedule's
        # coarsest level); see _cycle_select
        self.cycle_zoom = None

    @classmethod
    def from_config(cls, runner: ModelRunner, cfg, **kw):
        """Build from an InferenceConfig (cotr_tpu.config.InferenceConfig)."""
        return cls(runner, batch_size=cfg.batch_size, mode=cfg.mode, **kw)

    # ------------------------------------------------------------------ seed

    def _dense_fields_many(self, pairs):
        """Dense seed passes for many pairs honoring the engine mode
        (sparse_engine.py:114-141), batched through one device pass
        (dense_flow_many). Returns one (corr_a, con_a, corr_b, con_b) per
        pair, at ORIGINAL image resolutions."""
        from cotr_tpu.inference.dense import dense_flow_many

        prepped = []
        for img_a, img_b in pairs:
            a_shape = img_a.shape[:2]
            b_shape = img_b.shape[:2]
            nonsquare = (a_shape[0] != a_shape[1] or
                         b_shape[0] != b_shape[1])
            if self.mode == "stretching" and nonsquare:
                prepped.append((stretch_to_square(img_a),
                                stretch_to_square(img_b),
                                True, a_shape, b_shape))
            else:
                prepped.append((img_a, img_b, False, a_shape, b_shape))
        raw = dense_flow_many(self.runner,
                              [(a, b) for a, b, _, _, _ in prepped],
                              seed_stride=self.seed_stride)
        out = []
        for (_, _, stretched, a_shape, b_shape), \
                (corr_a, con_a, corr_b, con_b) in zip(prepped, raw):
            if stretched:
                corr_a = _resize_field(corr_a, a_shape)
                con_a = _resize_field(con_a, a_shape)
                corr_b = _resize_field(corr_b, b_shape)
                con_b = _resize_field(con_b, b_shape)
            out.append((corr_a, con_a, corr_b, con_b))
        return out

    def _dense_fields(self, img_a: np.ndarray, img_b: np.ndarray):
        """Dense seed pass honoring the engine mode (sparse_engine.py:114-141).

        Returns (corr_a, con_a, corr_b, con_b) at ORIGINAL image resolutions.
        """
        return self._dense_fields_many([(img_a, img_b)])[0]

    def _seed_tasks(self, img_a, img_b, max_corrs, queries_a, force,
                    dense=None, rng=None):
        """Vectorized gen_tasks (sparse_engine.py:108-195).

        Returns (loc_from, loc_to, identifiers, area_a, area_b); all task
        arrays describe a->b refinements. ``dense`` short-circuits the seed
        pass with precomputed fields; ``rng`` overrides the engine stream
        (per-pair streams keep multi-pair runs equal to serial ones).
        """
        if rng is None:
            rng = self.rng
        corr_a, con_a, corr_b, con_b = dense if dense is not None \
            else self._dense_fields(img_a, img_b)
        h_a, w_a = img_a.shape[:2]
        h_b, w_b = img_b.shape[:2]
        mask_a = con_a < THRESHOLD_SPARSE
        mask_b = con_b < THRESHOLD_SPARSE
        area_a = float((con_a < THRESHOLD_AREA).sum()) / mask_a.size
        area_b = float((con_b < THRESHOLD_AREA).sum()) / mask_b.size

        def lookup(corr, pos_yx, to_wh):
            tgt = corr[pos_yx[:, 0], pos_yx[:, 1]]  # (N, 2) in [-1, 1]
            return (tgt * 0.5 + 0.5) * np.asarray(to_wh)

        if queries_a is None:
            # random confident seeds from BOTH directions
            # (sparse_engine.py:148-166)
            idx_a = np.argwhere(mask_a)
            idx_b = np.argwhere(mask_b)
            sel_a = idx_a[rng.choice(len(idx_a),
                                     min(max_corrs, len(idx_a)))] \
                if len(idx_a) else np.zeros((0, 2), int)
            sel_b = idx_b[rng.choice(len(idx_b),
                                     min(max_corrs, len(idx_b)))] \
                if len(idx_b) else np.zeros((0, 2), int)
            lf_a = sel_a[:, ::-1].astype(np.float64)
            lt_a = lookup(corr_a, sel_a, (w_b, h_b))
            # b-seeds fix the first guess instead of the query
            # (sparse_engine.py:159-166)
            lt_b = sel_b[:, ::-1].astype(np.float64)
            lf_b = lookup(corr_b, sel_b, (w_a, h_a))
            loc_from = np.concatenate([lf_a, lf_b], axis=0)
            loc_to = np.concatenate([lt_a, lt_b], axis=0)
            ident = np.arange(len(loc_from))
        elif force:
            # every query becomes a task (sparse_engine.py:169-173)
            pos = queries_a[:, ::-1]
            pos = np.stack([np.clip(pos[:, 0], 0, corr_a.shape[0] - 1),
                            np.clip(pos[:, 1], 0, corr_a.shape[1] - 1)],
                           axis=1).astype(int)
            loc_from = queries_a.astype(np.float64)
            loc_to = lookup(corr_a, pos, (w_b, h_b))
            ident = np.arange(len(queries_a))
        else:
            # confidence-filtered + backfill (sparse_engine.py:175-194)
            pos = queries_a[:, ::-1]
            inb = ((pos < np.array([h_a, w_a]) - 1).all(axis=1) &
                   (pos >= 0).all(axis=1))
            posi = np.floor(pos).astype(int)
            posi_c = np.stack([np.clip(posi[:, 0], 0, h_a - 1),
                               np.clip(posi[:, 1], 0, w_a - 1)], axis=1)
            confident = np.zeros(len(queries_a), bool)
            confident[inb] = mask_a[posi_c[inb, 0], posi_c[inb, 1]]
            chosen = inb & confident
            n_backfill = max(0, max_corrs - int(chosen.sum()))
            backfill_pool = np.where(inb & ~confident)[0][:n_backfill]
            sel = np.concatenate([np.where(chosen)[0], backfill_pool])
            loc_from = queries_a[sel].astype(np.float64)
            loc_to = lookup(corr_a, posi_c[sel], (w_b, h_b))
            ident = sel
        return (loc_from, loc_to, ident.astype(int), area_a, area_b)

    # ---------------------------------------------------------------- refine

    def _refine_all(self, img_a, img_b, loc_from, loc_to, area_a, area_b,
                    zoom_ins, converge_iters):
        """Run every task through the zoom scan; returns the location history
        (len(zoom_ins)+1, T, 2): the seed row plus one converged row per zoom
        level (loc_history semantics, refinement_task.py:43,179)."""
        s_from, s_to = relative_scales(area_a, area_b)

        pyr_a, hw_a = self.refiner.prepare_image(img_a)
        pyr_b, hw_b = self.refiner.prepare_image(img_b)

        t = len(loc_from)
        histories = []
        for start in range(0, t, self.batch_size):
            lf = loc_from[start:start + self.batch_size]
            lt = loc_to[start:start + self.batch_size]
            n = len(lf)
            pad = -(-n // self.task_bucket) * self.task_bucket - n
            if pad:
                lf = np.concatenate([lf, np.zeros((pad, 2))], axis=0)
                lt = np.concatenate([lt, np.zeros((pad, 2))], axis=0)
            hist = self.refiner.refine(pyr_a, hw_a, pyr_b, hw_b, lf, lt,
                                       s_from, s_to, zoom_ins, converge_iters)
            if np.isnan(hist).any():
                raise ValueError(
                    "NaN in refinement predictions (sparse_engine.py:54-55)")
            histories.append(hist[:, :n])
            self.total_tasks += n * hist.shape[0]
        history = np.concatenate(histories, axis=1)  # (Z, T, 2)
        return np.concatenate([loc_to[None], history], axis=0)

    # --------------------------------------------------------------- conclude

    def _cycle_select(self, img_a, img_b, loc_from, history, area_a, area_b,
                      check_zoom):
        """Per-query candidate selection by cycle error (TPU-native extension
        beyond reference parity; OFF by default — see ``cycle_select``).

        The zoom history holds C = 1 seed + Z per-level estimates per query.
        A diverged refinement walk (final estimate WORSE than its seed —
        tools/diagnose_tail.py classifies ~24% of eval queries this way) is
        invisible to the reference's std filter under force=True. Ground
        truth is unavailable, but cycle consistency is a usable proxy: batch
        ONE reverse pass (b->a) with all C*T candidates as source points and
        the a-side crop centered at the KNOWN query point; a candidate whose
        content does not correspond to the query's neighborhood reverse-maps
        far from it. Returns (selected (T, 2), cycle_err (C, T)).

        Cost: one extra zoom level with C*T tasks through the engine's own
        refinement machinery (grouped or scan — whichever subclass runs)."""
        hist = np.asarray(history, np.float64)
        c, t = hist.shape[0], hist.shape[1]
        cands = hist.reshape(c * t, 2)
        back0 = np.tile(np.asarray(loc_from, np.float64), (c, 1))
        # reverse direction: source = img_b at the candidate, target crop in
        # img_a centered at the original query (areas swapped accordingly)
        rev = self._refine_all(img_b, img_a, cands, back0, area_b, area_a,
                               [float(check_zoom)], 1)
        cyc = np.linalg.norm(rev[-1] - back0, axis=1).reshape(c, t)
        # a candidate outside img_b (a marginally-out-of-frame dense seed)
        # must never be selected over an in-frame one: the final zoom level
        # is always in-frame (crops clamp), so a fallback always exists
        hb, wb = img_b.shape[:2]
        oob = ((hist[..., 0] < 0) | (hist[..., 0] >= wb)
               | (hist[..., 1] < 0) | (hist[..., 1] >= hb))
        sel = np.where(oob, np.inf, cyc).argmin(axis=0)
        return hist[sel, np.arange(t)], cyc

    def _filter_mask(self, loc_from, history, img_a_shape, img_b_shape,
                     best=None):
        """The conclude filters as a boolean keep-mask: std filter
        (refinement_task.py:184-188) + border filter
        (sparse_engine.py:58-84), vectorized."""
        if best is None:
            best = history[-1]
        corrs = np.concatenate([loc_from, best], axis=1)
        std = history.std(axis=0).max(axis=1)  # (T,)
        keep = std < THRESHOLD_PIXELS_RELATIVE * max(*img_b_shape)
        hi = np.concatenate([np.asarray(img_a_shape[::-1]),
                             np.asarray(img_b_shape[::-1])])
        keep &= (corrs < hi).all(axis=1) & (corrs > 0).all(axis=1)
        return keep

    def _conclude(self, loc_from, history, ident, img_a_shape, img_b_shape,
                  force, best_override=None):
        """std filter (refinement_task.py:184-188) + border filter
        (sparse_engine.py:58-84), vectorized."""
        best = history[-1] if best_override is None else best_override
        corrs = np.concatenate([loc_from, best], axis=1)
        keep = np.ones(len(corrs), bool)
        if not force:
            keep = self._filter_mask(loc_from, history, img_a_shape,
                                     img_b_shape, best=best)
        return corrs[keep], ident[keep]

    # ------------------------------------------------------------ public API

    def cotr_corr_multiscale(self, img_a, img_b,
                             zoom_ins: Sequence[float] = (1.0,),
                             converge_iters: int = 1, max_corrs: int = 1000,
                             queries_a: Optional[np.ndarray] = None,
                             return_idx: bool = False, force: bool = False,
                             areas: Optional[Sequence[float]] = None,
                             cycle_select=False, _dense=None):
        """Reference API (sparse_engine.py:197-233): multiscale sparse
        correspondence a->b. Returns (max_corrs, 4) [x_a, y_a, x_b, y_b]
        (+ query indices with return_idx). ``_dense``: precomputed seed
        fields (the cycle wrapper batches both directions' dense passes
        through one device call; the fields depend only on the images, so
        precomputing changes nothing).

        ``cycle_select`` (default False = exact reference semantics): score
        every query's zoom-history candidates (seed + per-level estimates)
        by one batched reverse cycle check and return the per-query argmin
        instead of the final level — recovers force=True queries whose
        refinement walk diverged (see ``_cycle_select``). ``"rescue"``
        applies the selection only to queries the std/border filters flag,
        keeping the converged answer for healthy queries."""
        img_a = np.asarray(img_a)
        img_b = np.asarray(img_b)
        if queries_a is not None:
            queries_a = np.asarray(queries_a, np.float64).copy()

        if areas is not None:
            # known-scale path (sparse_engine.py:100-113): skip the dense
            # pass, seed via one-shot patch queries
            assert queries_a is not None and force
            corr = self.corr_base(img_a, img_b, queries_a)
            loc_from, loc_to = corr[:, :2], corr[:, 2:]
            ident = np.arange(len(corr))
            area_a, area_b = float(areas[0]), float(areas[1])
        else:
            loc_from, loc_to, ident, area_a, area_b = self._seed_tasks(
                img_a, img_b, max_corrs, queries_a, force, dense=_dense)

        if len(loc_from) == 0:
            empty = np.zeros((0, 4))
            return (empty, np.zeros(0, int)) if return_idx else empty

        history = self._refine_all(img_a, img_b, loc_from, loc_to,
                                   area_a, area_b, zoom_ins, converge_iters)
        best_override, cyc = None, None
        if cycle_select == "rescue":
            # rescue mode: keep the converged answer wherever the engine's
            # own std/border filters pass, and spend the reverse cycle
            # check ONLY on flagged queries — full replacement measurably
            # trades median for tail (eval suite: median 11.5 -> 13.7 px,
            # p90 66 -> 51; PERF.md §10); rescue targets the tail without
            # touching the healthy center mass, and the subset keeps the
            # reverse pass (the feature's dominant cost) proportional to
            # the tail, not the workload
            check = self.cycle_zoom if self.cycle_zoom else zoom_ins[0]
            healthy = self._filter_mask(loc_from, history,
                                        img_a.shape[:2], img_b.shape[:2])
            flagged = np.nonzero(~healthy)[0]
            best_override = history[-1].copy()
            cyc = np.full((history.shape[0], len(loc_from)), np.nan)
            if len(flagged):
                sel, cyc_sub = self._cycle_select(
                    img_a, img_b, loc_from[flagged], history[:, flagged],
                    area_a, area_b, check)
                best_override[flagged] = sel
                cyc[:, flagged] = cyc_sub
        elif cycle_select:
            best_override, cyc = self._cycle_select(
                img_a, img_b, loc_from, history, area_a, area_b,
                self.cycle_zoom if self.cycle_zoom else zoom_ins[0])
        corrs, idx = self._conclude(loc_from, history, ident,
                                    img_a.shape[:2], img_b.shape[:2], force,
                                    best_override=best_override)
        if self.collect_diagnostics:
            # what the std/border filters WOULD have kept (force runs skip
            # them, so the diag re-applies them with force=False)
            _, kept = self._conclude(loc_from, history, ident,
                                     img_a.shape[:2], img_b.shape[:2], False)
            self.last_diag = {
                "loc_from": loc_from.copy(), "ident": ident.copy(),
                "history": history.copy(),  # (1 seed + Z levels, T, 2)
                "area_a": area_a, "area_b": area_b,
                "kept_by_filters": np.isin(ident, kept)}
            if cycle_select:
                self.last_diag["cycle_err"] = cyc      # (C, T)
                self.last_diag["selected"] = best_override.copy()
        corrs, idx = corrs[:max_corrs], idx[:max_corrs]
        return (corrs, idx) if return_idx else corrs

    def cotr_corr_multiscale_with_cycle_consistency(
            self, img_a, img_b, zoom_ins: Sequence[float] = (1.0,),
            converge_iters: int = 1, max_corrs: int = 1000,
            queries_a: Optional[np.ndarray] = None, return_idx: bool = False,
            return_cycle_error: bool = False):
        """Bidirectional matching ranked by cycle error
        (sparse_engine.py:235-264)."""
        EXTRACTION_RATE = 0.3
        temp_max = int(max_corrs / EXTRACTION_RATE)
        if queries_a is not None:
            temp_max = min(temp_max, queries_a.shape[0])
            queries_a = np.asarray(queries_a, np.float64).copy()
        # both directions' dense seed passes depend only on the images, so
        # they share ONE batched device pass up front (the reference runs
        # cotr_flow twice serially, sparse_engine.py:235-264) — bitwise the
        # same fields, half the seed-pass dispatches
        dense_f, dense_b = self._dense_fields_many(
            [(np.asarray(img_a), np.asarray(img_b)),
             (np.asarray(img_b), np.asarray(img_a))])
        corr_f, idx_f = self.cotr_corr_multiscale(
            img_a, img_b, zoom_ins=zoom_ins, converge_iters=converge_iters,
            max_corrs=temp_max, queries_a=queries_a, return_idx=True,
            _dense=dense_f)
        assert corr_f.shape[0] > 0, "forward pass produced no correspondences"
        corr_b, idx_b = self.cotr_corr_multiscale(
            img_b, img_a, zoom_ins=zoom_ins, converge_iters=converge_iters,
            max_corrs=corr_f.shape[0], queries_a=corr_f[:, 2:].copy(),
            return_idx=True, _dense=dense_b)
        assert corr_b.shape[0] > 0, "backward pass produced no correspondences"
        cycle_errors = np.linalg.norm(corr_f[idx_b][:, :2] - corr_b[:, 2:],
                                      axis=1)
        order = np.argsort(cycle_errors)
        out = [corr_f[idx_b][order][:max_corrs]]
        if return_idx:
            out.append(idx_f[idx_b][order][:max_corrs])
        if return_cycle_error:
            out.append(cycle_errors[order][:max_corrs])
        return out[0] if len(out) == 1 else out

    # ----------------------------------------------------------- extra paths

    def corr_base(self, img_a, img_b, queries_a) -> np.ndarray:
        """One-shot (no-zoom) sparse queries over exhaustive patch pairs with
        cycle-consistency confidence (cotr_corr_base,
        inference_helper.py:185-232)."""
        return self.corr_base_many([(img_a, img_b, queries_a)])[0]

    def corr_base_many(self, jobs) -> list:
        """Batched ``corr_base`` over MANY (img_a, img_b, queries_a) jobs.

        Every patch-pair canvas of every job joins ONE encode batch, and the
        forward + cycle decodes are two chunked dispatches over the whole
        batch — O(1) device dispatches per call instead of the reference's
        (and round-3 port's) 3 dispatches per patch-pair
        (inference_helper.py:185-232 runs a full forward per patch-pair;
        VERDICT r3 weak #5). Canvases are chunked to a fixed batch of 8 and
        query counts padded to a bucket so repeated calls reuse compiles.

        Returns one (N_i, 4) corrs array per job.
        """
        entries = []  # (job_idx, p_i, p_j, qn, in_patch)
        for ji, (img_a, img_b, queries_a) in enumerate(jobs):
            q = np.asarray(queries_a, np.float64)
            patches_b = to_square_patches(np.asarray(img_b))
            for p_i in to_square_patches(np.asarray(img_a)):
                in_patch = ((q[:, 0] >= p_i.x) & (q[:, 1] >= p_i.y) &
                            (q[:, 0] <= p_i.x + p_i.w) &
                            (q[:, 1] <= p_i.y + p_i.h))
                qn = np.stack([(q[:, 0] - p_i.x) / (2 * p_i.w),
                               (q[:, 1] - p_i.y) / p_i.h], axis=1)
                for p_j in patches_b:
                    entries.append((ji, p_i, p_j, qn, in_patch))

        from cotr_tpu.inference.dense import _canvases_for_jobs

        n_max = max(e[3].shape[0] for e in entries)
        n_pad = max(8, -(-n_max // 8) * 8)  # query-count bucket
        q_all = np.zeros((len(entries), n_pad, 2), np.float32)
        for k, (_, _, _, qn, _) in enumerate(entries):
            q_all[k, :qn.shape[0]] = qn

        chunk = 8  # fixed canvas batch: shape-stable encode/decode compiles
        outs, cycles = [], []
        for start in range(0, len(entries), chunk):
            sub = entries[start:start + chunk]
            canvas = _canvases_for_jobs(
                [(p_i.patch, p_j.patch) for _, p_i, p_j, _, _ in sub])
            qb = q_all[start:start + len(sub)]
            pad = chunk - len(sub)
            if pad and len(entries) > chunk:
                canvas = jnp.concatenate(
                    [canvas, jnp.repeat(canvas[-1:], pad, axis=0)], axis=0)
                qb = np.concatenate(
                    [qb, np.repeat(qb[-1:], pad, axis=0)], axis=0)
            mem = self.runner.encode(canvas)
            out = self.runner.decode_chunked(mem, jnp.asarray(qb))
            cyc = self.runner.decode_chunked(mem, out)
            outs.append(np.asarray(out)[:len(sub)])
            cycles.append(np.asarray(cyc)[:len(sub)])
        out_all = np.concatenate(outs, axis=0)
        cyc_all = np.concatenate(cycles, axis=0)

        per_job = [[] for _ in jobs]
        for k, (ji, p_i, p_j, qn, in_patch) in enumerate(entries):
            n = qn.shape[0]
            conf = np.linalg.norm(qn - cyc_all[k, :n], axis=1)
            conf[~in_patch] = np.inf
            per_job[ji].append(np.stack([
                (out_all[k, :n, 0] - 0.5) * 2 * p_j.w + p_j.x,
                out_all[k, :n, 1] * p_j.h + p_j.y,
                conf,
            ], axis=1))
        results = []
        for ji, (_, _, queries_a) in enumerate(jobs):
            preds = np.stack(per_job[ji])  # (P, N, 3)
            best = preds[np.argmin(preds[..., 2], axis=0),
                         np.arange(preds.shape[1])]
            results.append(np.concatenate(
                [np.asarray(queries_a, np.float64), best[:, :2]], axis=1))
        return results


class FasterSparseEngine(SparseEngine):
    """Squad-grouped engine (reference sparse_engine.py:267-427): queries
    that fall inside a pilot task's patch window share the pilot's crops, so
    one canvas encode serves up to ``max_load`` queries. Same accuracy
    caveat as the reference: members reuse the *pilot's* crop, trading a
    little spatial accuracy for throughput.
    """

    def __init__(self, runner: ModelRunner, batch_size: int = 256,
                 mode: str = "stretching", task_bucket: int = 256,
                 image_bucket: int = 256, seed: int = 0, max_load: int = 256,
                 mesh=None, crop_dtype=None, safe_area: float = 0.5,
                 group_cap: int = 128, group_bucket: int = 8,
                 member_bucket: int = 64, member_ladder: bool = False,
                 seed_stride: int = 1):
        super().__init__(runner, batch_size, mode, task_bucket, image_bucket,
                         seed, crop_dtype=crop_dtype, mesh=mesh,
                         seed_stride=seed_stride)
        self.max_load = max_load
        # dispatch chunking (refine_grouped defaults): group_cap bounds the
        # canvases per device call (attention buffers scale with it), and the
        # buckets bound compiled shapes. Dense clustered workloads raise
        # max_load into the thousands — there group_cap must drop so the
        # (group_cap, max_load+1, 512) decoder buffers stay inside HBM.
        self.group_cap = group_cap
        self.group_bucket = group_bucket
        self.member_bucket = member_bucket
        self.member_ladder = member_ladder
        # membership-window fraction of the pilot patch. 0.5 = exact
        # reference semantics (sparse_engine.py:297); larger groups more
        # queries per canvas encode at the price of accuracy near window
        # edges (production knob for spread workloads). Above 1.0 members
        # would leave the pilot's patch entirely (queries outside the
        # canvas domain); at/below 0 grouping is meaningless.
        if not 0.0 < safe_area <= 1.0:
            raise ValueError(f"safe_area must be in (0, 1], got {safe_area}")
        self.safe_area = safe_area
        from cotr_tpu.inference.grouped import GroupedStepper
        # mesh: shard the squad axis across devices (multi-chip inference)
        self._stepper = GroupedStepper(runner, crop_dtype=self.crop_dtype,
                                       mesh=mesh)

    @classmethod
    def from_config(cls, runner: ModelRunner, cfg, **kw):
        """Build from an InferenceConfig (cotr_tpu.config.InferenceConfig)."""
        return cls(runner, batch_size=cfg.batch_size, mode=cfg.mode,
                   max_load=cfg.max_load, **kw)

    def _refine_all(self, img_a, img_b, loc_from, loc_to, area_a, area_b,
                    zoom_ins, converge_iters):
        from cotr_tpu.inference.grouped import refine_grouped

        s_from, s_to = relative_scales(area_a, area_b)
        pyr_a, hw_a = self.refiner.prepare_image(img_a)
        pyr_b, hw_b = self.refiner.prepare_image(img_b)
        history = refine_grouped(
            self.runner, self._stepper, pyr_a, hw_a, pyr_b, hw_b,
            np.asarray(loc_from, np.float64), np.asarray(loc_to, np.float64),
            s_from, s_to, zoom_ins, self.rng, converge_iters=converge_iters,
            max_load=self.max_load, safe_area=self.safe_area,
            group_cap=self.group_cap, group_bucket=self.group_bucket,
            member_bucket=self.member_bucket,
            member_ladder=self.member_ladder)
        self.total_tasks += history.shape[0] * history.shape[1]
        return np.concatenate([np.asarray(loc_to)[None], history], axis=0)

    # ------------------------------------------------------- multi-pair API

    def _stack_images(self, imgs):
        """Pad N images to one common bucketed shape and upload as ONE
        (N, Hp, Wp, 3) [0,1] device stack (uint8 on the wire when possible —
        the tunnel moves ~30 MB/s)."""
        bucket = self.refiner.bucket
        hp = max(-(-im.shape[0] // bucket) * bucket for im in imgs)
        wp = max(-(-im.shape[1] // bucket) * bucket for im in imgs)
        all_uint8 = all(im.dtype == np.uint8 for im in imgs)
        stack = np.zeros((len(imgs), hp, wp, 3),
                         np.uint8 if all_uint8 else np.float32)
        for i, im in enumerate(imgs):
            stack[i, :im.shape[0], :im.shape[1]] = \
                im if all_uint8 else _to_float01(im)
        dev = jnp.asarray(stack).astype(jnp.float32)
        if all_uint8:
            dev = dev / 255.0
        return dev

    def cotr_corr_multiscale_multipair(
            self, pairs, zoom_ins: Sequence[float] = (1.0,),
            converge_iters: int = 1, max_corrs: int = 1000,
            queries_list=None, force: bool = False, areas_list=None,
            return_idx: bool = False, pair_seeds=None):
        """Batched multi-pair matching: ONE call refines N image pairs with
        shared device dispatches. The reference engine handles exactly one
        pair per call (sparse_engine.py:197) and its evaluations loop pairs
        serially; here the dense seed pass batches every pair's canvases
        (dense_flow_many) and refinement squads carry per-pair image indices
        (refine_grouped_pairs), so modest per-pair workloads — a MegaDepth
        val sweep, both directions of a guided-matching job — fill the
        canvas-encode batch instead of paying the dispatch floor per pair.

        pairs: [(img_a, img_b)] * N. ``queries_list``/``areas_list``:
        optional per-pair analogs of ``queries_a``/``areas``. ``max_corrs``
        may be a scalar or one value per pair. ``pair_seeds``: per-pair RNG
        seeds (ints, or live RandomState streams for callers chaining
        multipair calls); results match N serial ``cotr_corr_multiscale``
        calls on engines constructed with ``seed=pair_seeds[i]`` (within
        float tolerance of the dispatch-composition change).

        Returns a list of per-pair corrs (max_corrs, 4), or (corrs, idx)
        tuples with ``return_idx``.
        """
        from cotr_tpu.inference.grouped import refine_grouped_pairs

        n = len(pairs)
        if n == 0:
            return []
        pairs = [(np.asarray(a), np.asarray(b)) for a, b in pairs]
        if queries_list is None:
            queries_list = [None] * n
        queries_list = [None if q is None
                        else np.asarray(q, np.float64).copy()
                        for q in queries_list]
        max_corrs_list = list(max_corrs) if np.ndim(max_corrs) else \
            [int(max_corrs)] * n
        if pair_seeds is None:
            pair_seeds = [int(self.rng.randint(2 ** 31 - 1))
                          for _ in range(n)]
        rngs = [s if isinstance(s, np.random.RandomState)
                else np.random.RandomState(s) for s in pair_seeds]

        # ---- seed (batched dense pass unless scales are known)
        if areas_list is not None:
            for q in queries_list:
                assert q is not None and force
            # known-scale seeding: ALL pairs' patch canvases share one
            # batched corr_base pass (no per-pair encode/decode loop)
            corrs_all = self.corr_base_many(
                [(a, b, q) for (a, b), q in zip(pairs, queries_list)])
            seeds = [(corr[:, :2], corr[:, 2:], np.arange(len(corr)),
                      float(ar[0]), float(ar[1]))
                     for corr, ar in zip(corrs_all, areas_list)]
        else:
            dense = self._dense_fields_many(pairs)
            seeds = [self._seed_tasks(a, b, max_corrs_list[i], q, force,
                                      dense=dense[i], rng=rngs[i])
                     for i, ((a, b), q) in enumerate(zip(pairs,
                                                         queries_list))]

        imgs_a_dev = self._stack_images([a for a, _ in pairs])
        imgs_b_dev = self._stack_images([b for _, b in pairs])

        pair_states = []
        for i, (lf, lt, ident, area_a, area_b) in enumerate(seeds):
            s_from, s_to = relative_scales(area_a, area_b)
            pair_states.append(dict(
                hw_a=pairs[i][0].shape[:2], hw_b=pairs[i][1].shape[:2],
                s_from=s_from, s_to=s_to,
                loc_from=np.asarray(lf, np.float64),
                loc_to=np.asarray(lt, np.float64), rng=rngs[i]))

        hists = refine_grouped_pairs(
            self._stepper, imgs_a_dev, imgs_b_dev, pair_states, zoom_ins,
            converge_iters=converge_iters, max_load=self.max_load,
            safe_area=self.safe_area, group_cap=self.group_cap,
            group_bucket=self.group_bucket,
            member_bucket=self.member_bucket,
            member_ladder=self.member_ladder)

        results = []
        for i, (lf, lt, ident, _, _) in enumerate(seeds):
            if len(lf) == 0:
                empty = np.zeros((0, 4))
                results.append((empty, np.zeros(0, int)) if return_idx
                               else empty)
                continue
            if np.isnan(hists[i]).any():
                raise ValueError(
                    "NaN in refinement predictions (sparse_engine.py:54-55)")
            self.total_tasks += hists[i].shape[0] * hists[i].shape[1]
            history = np.concatenate(
                [np.asarray(lt, np.float64)[None], hists[i]], axis=0)
            corrs, idx = self._conclude(
                np.asarray(lf, np.float64), history, ident,
                pairs[i][0].shape[:2], pairs[i][1].shape[:2], force)
            corrs, idx = corrs[:max_corrs_list[i]], idx[:max_corrs_list[i]]
            results.append((corrs, idx) if return_idx else corrs)
        return results

    def cotr_corr_multiscale_with_cycle_consistency_multipair(
            self, pairs, zoom_ins: Sequence[float] = (1.0,),
            converge_iters: int = 1, max_corrs: int = 1000,
            queries_list=None, return_idx: bool = False,
            return_cycle_error: bool = False, pair_seeds=None):
        """Bidirectional cycle-ranked matching over MANY pairs: all N
        forward (a->b) jobs share device dispatches, then all N backward
        (b->a) jobs do — 2N canvas-encode streams collapse into 2 batched
        phases (the reference runs each direction of each pair serially,
        sparse_engine.py:235-264). Per-pair results match serial
        ``cotr_corr_multiscale_with_cycle_consistency`` calls on engines
        seeded ``pair_seeds[i]``.
        """
        EXTRACTION_RATE = 0.3  # sparse_engine.py:241
        n = len(pairs)
        pairs = [(np.asarray(a), np.asarray(b)) for a, b in pairs]
        if queries_list is None:
            queries_list = [None] * n
        if pair_seeds is None:
            pair_seeds = [int(self.rng.randint(2 ** 31 - 1))
                          for _ in range(n)]
        # live streams: each pair's forward seeding/refinement and backward
        # seeding/refinement must consume ONE stream in serial order
        rngs = [s if isinstance(s, np.random.RandomState)
                else np.random.RandomState(s) for s in pair_seeds]

        temp_max = []
        q_fwd = []
        for q in queries_list:
            tm = int(max_corrs / EXTRACTION_RATE)
            if q is not None:
                q = np.asarray(q, np.float64).copy()
                tm = min(tm, q.shape[0])
            temp_max.append(tm)
            q_fwd.append(q)

        fwd = self.cotr_corr_multiscale_multipair(
            pairs, zoom_ins=zoom_ins, converge_iters=converge_iters,
            max_corrs=temp_max, queries_list=q_fwd, return_idx=True,
            pair_seeds=rngs)
        for i, (corr_f, _) in enumerate(fwd):
            assert corr_f.shape[0] > 0, \
                f"forward pass produced no correspondences (pair {i})"

        bwd = self.cotr_corr_multiscale_multipair(
            [(b, a) for a, b in pairs], zoom_ins=zoom_ins,
            converge_iters=converge_iters,
            max_corrs=[corr_f.shape[0] for corr_f, _ in fwd],
            queries_list=[corr_f[:, 2:].copy() for corr_f, _ in fwd],
            return_idx=True, pair_seeds=rngs)

        results = []
        for i in range(n):
            corr_f, idx_f = fwd[i]
            corr_b, idx_b = bwd[i]
            assert corr_b.shape[0] > 0, \
                f"backward pass produced no correspondences (pair {i})"
            cycle_errors = np.linalg.norm(
                corr_f[idx_b][:, :2] - corr_b[:, 2:], axis=1)
            order = np.argsort(cycle_errors)
            out = [corr_f[idx_b][order][:max_corrs]]
            if return_idx:
                out.append(idx_f[idx_b][order][:max_corrs])
            if return_cycle_error:
                out.append(cycle_errors[order][:max_corrs])
            results.append(out[0] if len(out) == 1 else tuple(out))
        return results
