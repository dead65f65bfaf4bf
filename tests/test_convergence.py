"""Exact convergence-semantics parity vs the reference RefinementTask.

The reference converges at the final zoom by detecting an EXACT revisit in
the per-zoom prediction history and averaging the detected loop
(refinement_task.py:160-182 + find_prediction_loop,
inference_helper.py:22-28). These tests drive both the device scan
(`_refine_scan` via BatchRefiner) and the grouped host loop
(`refine_grouped`) with a table-driven stub whose predictions produce known
dynamics — a 3-cycle, a fixed point, a 2-cycle, and a non-repeating drift —
and compare the converged outputs against a literal host transcription of
the reference step() semantics.

Exactness setup: 512x512 images, zoom such that the crop size is exactly
256 (so crop->256 resize is the identity and all box/denormalization math
is exact in float32: offsets are integers, divisions are by powers of two).
The stub recovers the target patch origin (x0, y0) from coordinate-encoding
image pixels and predicts the next location from a lookup table.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cotr_tpu.inference import BatchRefiner, ModelRunner
from cotr_tpu.inference.grouped import refine_grouped
from cotr_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD

H = W = 512
SIZE = 256.0  # crop side at zoom 0.5: floor(512*0.5/2)*2

# dynamics table keyed on the target patch x0 (all keys distinct by design):
# 3-cycle A -> B -> C -> A
A, B, C = (200.0, 150.0), (210.0, 160.0), (190.0, 170.0)
# fixed point: seed2 -> D -> D
SEED2, D = (300.0, 300.0), (256.0, 256.0)
# 2-cycle P <-> Q
P, Q = (350.0, 300.0), (340.0, 310.0)
SEED3 = (150.0, 200.0)  # drifting chain via the default rule


def _x0y0(loc):
    x0 = min(max(np.floor(loc[0] - SIZE / 2), 0.0), W - SIZE)
    y0 = min(max(np.floor(loc[1] - SIZE / 2), 0.0), H - SIZE)
    return x0, y0


TABLE = {}
for src, dst in [(A, B), (B, C), (C, A), (SEED2, D), (D, D), (P, Q), (Q, P)]:
    TABLE[_x0y0(src)[0]] = dst
assert len(TABLE) == 7  # all x0 keys distinct


def f_loc(loc):
    """Host dynamics: next location as a function of the current target box."""
    x0, y0 = _x0y0(loc)
    return np.asarray(TABLE.get(x0, (x0 + 130.0, y0 + 130.0)), np.float64)


def reference_converge(loc0, converge_iters):
    """Literal transcription of the reference final-zoom convergence
    (refinement_task.py:153-182: step + find_prediction_loop)."""
    loc_to_at_zoom = []
    loc = np.asarray(loc0, np.float64)
    cur_iter = 0
    while True:
        loc = f_loc(loc)
        loc_to_at_zoom.append(loc.copy())
        zoom_finished = False
        if len(loc_to_at_zoom) >= 2:
            zoom_finished = bool(np.prod(
                np.array(loc_to_at_zoom[:-1]) == loc, axis=1).any())
        if cur_iter >= converge_iters - 1:
            zoom_finished = True
        cur_iter += 1
        if zoom_finished:
            arr = np.array(loc_to_at_zoom)
            if len(arr) >= 2 and np.prod(arr[:-1] == arr[-1], axis=1).any():
                start = np.where(np.prod(arr[:-1] == arr[-1],
                                         axis=1))[0][0]
                loc = arr[start:-1].mean(axis=0)
            return loc


SEEDS = np.array([A, SEED2, SEED3, P], np.float64)
# loc_from spread far apart so the grouped path forms singleton squads
LOC_FROM = np.array([[140.0, 140.0], [370.0, 140.0],
                     [140.0, 370.0], [370.0, 370.0]])


def coord_image():
    """img[y, x] = (x/512, y/512, 0) — crop pixel (0,0) encodes the box."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    return np.stack([xs / W, ys / H, np.zeros_like(xs)], axis=-1)


class TableStubModel:
    """Recovers (x0, y0) of the target patch from the canvas and predicts
    TABLE[x0] in patch-normalized coordinates (all math exact in f32)."""

    @staticmethod
    def _lookup(x0, y0):
        tx = x0 + 130.0
        ty = y0 + 130.0
        for k, (vx, vy) in TABLE.items():
            m = x0 == k
            tx = jnp.where(m, vx, tx)
            ty = jnp.where(m, vy, ty)
        return tx, ty

    def apply(self, params, canvas, queries, method=None):
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        # crop_b pixel (0, 0) lives at canvas column 256
        px = canvas[:, 0, 256, 0] * std[0] + mean[0]
        py = canvas[:, 0, 256, 1] * std[1] + mean[1]
        x0 = jnp.round(px * W)
        y0 = jnp.round(py * H)
        tx, ty = self._lookup(x0, y0)
        pred_x = (tx - x0) / (2.0 * SIZE) + 0.5
        pred_y = (ty - y0) / SIZE
        pred = jnp.stack([pred_x, pred_y], axis=-1)
        return jnp.broadcast_to(pred[:, None, :],
                                queries.shape).astype(jnp.float32)


class TableFakeStepper:
    """Grouped-path stub: predicts TABLE[x0] from the pilot's target box."""

    def __call__(self, img_a, img_b, boxes_from, boxes_to, queries):
        boxes_to = np.asarray(boxes_to, np.float64)
        g, m, _ = np.asarray(queries).shape
        preds = np.zeros((g, m, 2), np.float64)
        for gi in range(g):
            x0, y0, st = boxes_to[gi, 0], boxes_to[gi, 1], boxes_to[gi, 2]
            tx, ty = TABLE.get(x0, (x0 + 130.0, y0 + 130.0))
            preds[gi, :, 0] = (tx - x0) / (2.0 * st) + 0.5
            preds[gi, :, 1] = (ty - y0) / st
        return preds.astype(np.float32)


@pytest.mark.parametrize("converge_iters", [1, 3, 4, 6])
def test_scan_loop_averaging_matches_reference(converge_iters):
    runner = ModelRunner(TableStubModel(), params={})
    refiner = BatchRefiner(runner, bucket=256)
    img = coord_image()
    pyr, hw = refiner.prepare_image(img)
    hist = refiner.refine(pyr, hw, pyr, hw, LOC_FROM, SEEDS.copy(),
                          s_from=1.0, s_to=1.0, zoom_ins=[0.5],
                          converge_iters=converge_iters)
    assert hist.shape == (1, 4, 2)  # one row per zoom LEVEL
    expect = np.stack([reference_converge(s, converge_iters) for s in SEEDS])
    np.testing.assert_array_equal(hist[-1], expect.astype(np.float32))


def test_scan_known_loop_values():
    """Spot-check the analytically known loop averages at converge_iters=4:
    the 3-cycle averages (A+B+C)/3, the 2-cycle averages (P+Q)/2 and must
    FREEZE there (later iterations would drift it via the default rule if
    the freeze were ignored), the fixed point stays at D."""
    runner = ModelRunner(TableStubModel(), params={})
    refiner = BatchRefiner(runner, bucket=256)
    img = coord_image()
    pyr, hw = refiner.prepare_image(img)
    hist = refiner.refine(pyr, hw, pyr, hw, LOC_FROM, SEEDS.copy(),
                          s_from=1.0, s_to=1.0, zoom_ins=[0.5],
                          converge_iters=4)
    final = hist[-1]
    np.testing.assert_array_equal(
        final[0], np.mean([A, B, C], axis=0).astype(np.float32))
    np.testing.assert_array_equal(final[1], np.asarray(D, np.float32))
    np.testing.assert_array_equal(
        final[3], np.mean([P, Q], axis=0).astype(np.float32))


@pytest.mark.parametrize("converge_iters", [1, 3, 4, 6])
def test_grouped_loop_averaging_matches_reference(converge_iters):
    refiner = BatchRefiner(ModelRunner(TableStubModel(), params={}),
                           bucket=256)
    img = coord_image()
    pyr, hw = refiner.prepare_image(img)
    hist = refine_grouped(
        None, TableFakeStepper(), pyr, hw, pyr, hw,
        LOC_FROM.astype(np.float64), SEEDS.copy(), 1.0, 1.0, [0.5],
        np.random.RandomState(0), converge_iters=converge_iters,
        max_load=4)
    assert hist.shape == (1, 4, 2)
    expect = np.stack([reference_converge(s, converge_iters) for s in SEEDS])
    np.testing.assert_array_equal(hist[-1], expect)


def test_two_level_history_semantics():
    """With two zoom levels the history has one row per level; only the
    final level runs converge iterations (refinement_task.py:167-170)."""
    runner = ModelRunner(TableStubModel(), params={})
    refiner = BatchRefiner(runner, bucket=256)
    img = coord_image()
    pyr, hw = refiner.prepare_image(img)
    hist = refiner.refine(pyr, hw, pyr, hw, LOC_FROM, SEEDS.copy(),
                          s_from=1.0, s_to=1.0, zoom_ins=[0.5, 0.5],
                          converge_iters=4)
    assert hist.shape == (2, 4, 2)
    # level 0 = exactly one application of the dynamics
    expect0 = np.stack([f_loc(s) for s in SEEDS]).astype(np.float32)
    np.testing.assert_array_equal(hist[0], expect0)
    # level 1 converges from there
    expect1 = np.stack([reference_converge(f_loc(s), 4) for s in SEEDS])
    np.testing.assert_array_equal(hist[1], expect1.astype(np.float32))


class QueryAwareFakeStepper(TableFakeStepper):
    """TableFakeStepper plus a per-query offset: catches member/query
    packing bugs that squad-constant predictions would mask."""

    def __call__(self, img_a, img_b, boxes_from, boxes_to, queries):
        preds = super().__call__(img_a, img_b, boxes_from, boxes_to, queries)
        return preds + 0.01 * np.asarray(queries, np.float32)


def test_member_ladder_matches_default_chunking():
    """member_ladder re-orders squads by size and re-chunks dispatches under
    a cell budget; per-task results must be bit-identical to the two-bucket
    default (chunk composition only affects padding, never values)."""
    refiner = BatchRefiner(ModelRunner(TableStubModel(), params={}),
                           bucket=256)
    img = coord_image()
    pyr, hw = refiner.prepare_image(img)
    rng = np.random.RandomState(7)
    t = 300
    loc_from = rng.uniform(20, 490, (t, 2))
    seeds = rng.uniform(20, 490, (t, 2))
    kw = dict(converge_iters=2, max_load=64, group_bucket=4,
              member_bucket=8, group_cap=16)
    h0 = refine_grouped(None, QueryAwareFakeStepper(), pyr, hw, pyr, hw,
                        loc_from, seeds.copy(), 1.0, 1.0, [0.7, 0.5],
                        np.random.RandomState(3), member_ladder=False, **kw)
    h1 = refine_grouped(None, QueryAwareFakeStepper(), pyr, hw, pyr, hw,
                        loc_from, seeds.copy(), 1.0, 1.0, [0.7, 0.5],
                        np.random.RandomState(3), member_ladder=True, **kw)
    np.testing.assert_array_equal(h0, h1)


def test_member_pad_ladder():
    from cotr_tpu.inference.grouped import _member_pad

    # default: exactly two shapes
    assert _member_pad(5, 256, 64, False) == 64
    assert _member_pad(65, 256, 64, False) == 257
    # ladder: next pow2, floored at member_bucket, capped at max_load+1
    assert _member_pad(5, 4096, 64, True) == 64
    assert _member_pad(65, 4096, 64, True) == 128
    assert _member_pad(1500, 4096, 64, True) == 2048
    assert _member_pad(4097, 4096, 64, True) == 4097
