"""Inference-engine integration tests with an identity stub model.

The stub maps every query to the same relative position in the other canvas
half (x -> x +/- 0.5). Under this model the TRUE correspondence between two
equal-size images is the identity, which exercises every piece of coordinate
plumbing — dense grid decode, cycle confidence, seed lookup, patch boxes,
query normalization, prediction denormalization, zoom recursion, filters —
with an analytically known answer: refined loc_to == loc_from.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cotr_tpu.inference import (BatchRefiner, ModelRunner, SparseEngine,
                                dense_pass, patch_box)


class IdentityStubModel:
    """model.apply-compatible stub: decode(q) swaps canvas halves."""

    @staticmethod
    def _map(queries):
        x = queries[..., 0]
        x2 = jnp.where(x < 0.5, x + 0.5, x - 0.5)
        return jnp.stack([x2, queries[..., 1]], axis=-1)

    def apply(self, params, *args, method=None, **kwargs):
        if method == "encode":
            canvas = args[0]
            return jnp.zeros((canvas.shape[0], 512, 256), jnp.float32)
        if method == "decode":
            _mem, queries = args
            return self._map(queries)
        _canvas, queries = args
        return self._map(queries)


@pytest.fixture(scope="module")
def stub_runner():
    return ModelRunner(IdentityStubModel(), params={}, decode_chunk=16384)


def test_patch_box_matches_reference_semantics():
    """patch_box vs a direct transcription of get_patch_centered_at
    (inference_helper.py:78-102)."""
    rng = np.random.RandomState(0)
    h, w = 480, 640
    for _ in range(50):
        pos = rng.uniform(-10, 700, 2)
        scale = rng.uniform(0.05, 1.2)
        # reference math
        short = min(h, w)
        size = int((short * np.clip(scale, 0.0, 1.0)) // 2 * 2)
        lu_y = int(pos[1] - size // 2)
        lu_x = int(pos[0] - size // 2)
        lu_y = max(lu_y, 0)
        lu_x = max(lu_x, 0)
        if lu_y + size > h:
            lu_y -= (lu_y + size) - h
        if lu_x + size > w:
            lu_x -= (lu_x + size) - w
        x0, y0, sz = patch_box(jnp.asarray(pos, jnp.float32)[None],
                               jnp.float32(scale),
                               jnp.asarray(h), jnp.asarray(w))
        # int() truncation vs floor differ only for fractional negatives that
        # clamp to 0 anyway; interior positions must match exactly
        assert int(sz) == size
        assert int(np.asarray(x0)[0]) == lu_x, (pos, scale)
        assert int(np.asarray(y0)[0]) == lu_y, (pos, scale)


def test_dense_pass_identity_stub(stub_runner):
    """Under the identity stub the dense flow is the identity and confidence
    is ~0 everywhere."""
    img = np.zeros((256, 256, 3), np.float32)
    corr_a, corr_b = dense_pass(stub_runner, img, img)
    assert corr_a.shape == (256, 256, 3)
    # Cycle confidence carries an inherent ~0.004 half-pixel bias from
    # grid_sample's align_corners=False mapping (the reference shares it —
    # hence THRESHOLD_SPARSE=0.02); borders are legitimately unreliable.
    interior = corr_a[2:-2, 2:-2]
    assert interior[..., 2].max() < 0.02
    # flow maps pixel (x, y) to the same [-1, 1] position in image b
    ys, xs = np.mgrid[0:256, 0:256]
    expect_x = (xs / 256.0) * 2 - 1
    expect_y = (ys / 256.0) * 2 - 1
    np.testing.assert_allclose(interior[..., 0], expect_x[2:-2, 2:-2], atol=1e-4)
    np.testing.assert_allclose(interior[..., 1], expect_y[2:-2, 2:-2], atol=1e-4)


def _stub_expected_step(loc_from, loc_to, scale_f, scale_t, h, w):
    """Analytic prediction of one refinement step under the identity stub:
    pred keeps the query's patch-relative position, so
    new = loc_from * st/sf + (x0t - x0f * st/sf)."""
    from cotr_tpu.inference.grouped import patch_box_np

    x0f, y0f, sf = patch_box_np(loc_from, scale_f, h, w)
    x0t, y0t, st = patch_box_np(loc_to, scale_t, h, w)
    qx = (loc_from[:, 0] - x0f) / (2 * sf)
    qy = (loc_from[:, 1] - y0f) / sf
    return np.stack([qx * 2 * st + x0t, qy * st + y0t], axis=-1)


def test_refiner_matches_analytic_box_math(stub_runner):
    """The device scan must reproduce the host-side transcription of the
    box/query/denormalization math exactly (sub-pixel)."""
    refiner = BatchRefiner(stub_runner, bucket=256)
    img = np.random.RandomState(0).uniform(0, 1, (512, 512, 3)).astype(np.float32)
    pyr, hw = refiner.prepare_image(img)
    loc_from = np.array([[100.0, 200.0], [400.0, 50.0], [256.0, 256.0]])
    loc_to0 = loc_from + np.array([5.0, -3.0])  # seed slightly off
    zooms = [0.5, 0.25, 0.0625]
    hist = refiner.refine(pyr, hw, pyr, hw, loc_from, loc_to0,
                          s_from=1.0, s_to=1.0, zoom_ins=zooms)
    assert hist.shape == (3, 3, 2)
    expect = loc_to0.copy()
    for i, z in enumerate(zooms):
        expect = _stub_expected_step(loc_from, expect, z, z, 512, 512)
        np.testing.assert_allclose(hist[i], expect, atol=0.02, rtol=0)


def test_refiner_exact_seed_is_fixed_point(stub_runner):
    """A perfectly seeded task must stay put through every zoom level."""
    refiner = BatchRefiner(stub_runner, bucket=256)
    img = np.random.RandomState(1).uniform(0, 1, (512, 512, 3)).astype(np.float32)
    pyr, hw = refiner.prepare_image(img)
    loc = np.array([[100.0, 200.0], [400.0, 50.0], [256.0, 256.0]])
    hist = refiner.refine(pyr, hw, pyr, hw, loc, loc.copy(),
                          s_from=1.0, s_to=1.0, zoom_ins=[0.5, 0.25, 0.0625])
    for i in range(hist.shape[0]):
        np.testing.assert_allclose(hist[i], loc, atol=0.02)


def test_engine_end_to_end_identity(stub_runner):
    """Full engine pass: seeds from the dense field, refines, filters."""
    eng = SparseEngine(stub_runner, mode="tile", task_bucket=64)
    rng = np.random.RandomState(1)
    img = rng.uniform(0, 255, (512, 512, 3)).astype(np.uint8)
    queries = rng.uniform(20, 490, (32, 2))
    corrs, idx = eng.cotr_corr_multiscale(
        img, img, zoom_ins=[0.5, 0.25], max_corrs=32, queries_a=queries,
        force=True, return_idx=True)
    assert corrs.shape[0] == 32
    # The dense seed grid carries the reference's inherent half-pixel bias
    # (queries at pixel edges, inference_helper.py:117-121) and the
    # patch-relative stub preserves seed offsets through floor-quantized
    # boxes -> up to ~1px. Real coordinate bugs show as >>1px shifts.
    np.testing.assert_allclose(corrs[:, 2:], corrs[:, :2], atol=1.5)
    # identifiers preserved
    np.testing.assert_array_equal(np.sort(idx), np.arange(32))


def test_engine_cycle_consistency_wrapper(stub_runner):
    eng = SparseEngine(stub_runner, mode="tile", task_bucket=64)
    rng = np.random.RandomState(2)
    img = rng.uniform(0, 255, (512, 512, 3)).astype(np.uint8)
    queries = rng.uniform(20, 490, (40, 2))
    corrs, cyc = eng.cotr_corr_multiscale_with_cycle_consistency(
        img, img, zoom_ins=[0.5, 0.25], max_corrs=10, queries_a=queries,
        return_cycle_error=True)
    assert corrs.shape[0] == 10
    assert (cyc < 2.5).all()
    np.testing.assert_allclose(corrs[:, 2:], corrs[:, :2], atol=1.5)


def test_corr_base_identity(stub_runner):
    eng = SparseEngine(stub_runner, mode="tile")
    img = np.zeros((300, 300, 3), np.uint8)
    queries = np.array([[50.0, 60.0], [200.0, 150.0]])
    out = eng.corr_base(img, img, queries)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out[:, 2:], queries, atol=1.0)


@pytest.mark.parametrize("ladder", [False, True])
def test_grouped_engine_identity(stub_runner, ladder):
    """FasterSparseEngine squad path must also recover the identity —
    with both the two-bucket default and the dense-regime member ladder."""
    from cotr_tpu.inference.engine import FasterSparseEngine
    eng = FasterSparseEngine(stub_runner, mode="tile", task_bucket=64,
                             max_load=64, member_ladder=ladder)
    rng = np.random.RandomState(4)
    img = rng.uniform(0, 255, (512, 512, 3)).astype(np.uint8)
    queries = rng.uniform(30, 480, (48, 2))
    corrs, idx = eng.cotr_corr_multiscale(
        img, img, zoom_ins=[0.5, 0.25], max_corrs=48, queries_a=queries,
        force=True, return_idx=True)
    assert corrs.shape[0] == 48
    np.testing.assert_allclose(corrs[:, 2:], corrs[:, :2], atol=1.5)


def test_runner_decode_chunked_matches_decode(stub_runner):
    mem = jnp.zeros((1, 512, 256))
    q = np.random.RandomState(3).uniform(0, 1, (1, 1000, 2)).astype(np.float32)
    a = np.asarray(stub_runner.decode(mem, q))
    b = np.asarray(stub_runner.decode_chunked(mem, q))
    np.testing.assert_allclose(a, b, atol=1e-6)


class ContentStubModel(IdentityStubModel):
    """Identity stub plus a tiny offset derived from the ENCODED CANVAS
    CONTENT. The pure identity stub ignores the images entirely, so it
    cannot detect a dispatch that crops the wrong pair's images; this stub
    makes every prediction depend on what was actually cropped, which pins
    the per-squad image-index plumbing of the multi-pair engine."""

    AMP = 2e-3

    def apply(self, params, *args, method=None, **kwargs):
        if method == "encode":
            canvas = args[0]
            m = jnp.mean(canvas, axis=(1, 2, 3))  # (B,)
            return jnp.broadcast_to(m[:, None, None],
                                    (canvas.shape[0], 512, 256))
        if method == "decode":
            memory, queries = args
            off = memory[:, 0, 0] * self.AMP
            return self._map(queries) + off[:, None, None]
        canvas, queries = args
        m = jnp.mean(canvas, axis=(1, 2, 3))
        return self._map(queries) + (m * self.AMP)[:, None, None]


@pytest.mark.slow
def test_multipair_matches_serial_loop():
    """cotr_corr_multiscale_multipair == N serial cotr_corr_multiscale calls
    with the same per-pair seeds (VERDICT r2 item 2: the batched multi-pair
    engine must be a pure throughput change, identical outputs)."""
    from cotr_tpu.inference.engine import FasterSparseEngine

    runner = ModelRunner(ContentStubModel(), params={}, decode_chunk=16384)
    rng = np.random.RandomState(7)
    pairs = []
    sizes = [(384, 384), (384, 384), (320, 448)]
    for h, w in sizes:
        img_a = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        img_b = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        pairs.append((img_a, img_b))
    queries = [rng.uniform(30, 300, (24, 2)) for _ in sizes]
    seeds = [11, 22, 33]

    serial = []
    for k in range(len(pairs)):
        eng = FasterSparseEngine(runner, mode="tile", task_bucket=64,
                                 max_load=64, seed=seeds[k])
        serial.append(eng.cotr_corr_multiscale(
            pairs[k][0], pairs[k][1], zoom_ins=[0.5, 0.25], max_corrs=24,
            queries_a=queries[k], force=True))

    eng = FasterSparseEngine(runner, mode="tile", task_bucket=64,
                             max_load=64)
    multi = eng.cotr_corr_multiscale_multipair(
        pairs, zoom_ins=[0.5, 0.25], max_corrs=24, queries_list=queries,
        force=True, pair_seeds=seeds)

    for k in range(len(pairs)):
        assert multi[k].shape == serial[k].shape
        np.testing.assert_allclose(multi[k], serial[k], atol=5e-3,
                                   err_msg=f"pair {k}")


@pytest.mark.slow
def test_cycle_multipair_matches_serial_loop():
    """Bidirectional multipair wrapper == serial per-pair cycle calls with
    the same seeds (VERDICT r2 item 4: both directions batched, parity
    preserved)."""
    from cotr_tpu.inference.engine import FasterSparseEngine

    runner = ModelRunner(ContentStubModel(), params={}, decode_chunk=16384)
    rng = np.random.RandomState(9)
    pairs = []
    for _ in range(2):
        img_a = rng.uniform(0, 255, (384, 384, 3)).astype(np.uint8)
        img_b = rng.uniform(0, 255, (384, 384, 3)).astype(np.uint8)
        pairs.append((img_a, img_b))
    queries = [rng.uniform(30, 350, (30, 2)) for _ in pairs]
    seeds = [5, 6]

    # keep every query (no ranking cut) and align rows by query index:
    # ~1e-6 coordinate jitter from different dispatch batch compositions
    # legitimately flips argsort order between near-tied cycle errors, so
    # rank order is not the invariant — the per-query correspondences are.
    serial = []
    for k in range(len(pairs)):
        eng = FasterSparseEngine(runner, mode="tile", task_bucket=64,
                                 max_load=64, seed=seeds[k])
        serial.append(eng.cotr_corr_multiscale_with_cycle_consistency(
            pairs[k][0], pairs[k][1], zoom_ins=[0.5, 0.25],
            max_corrs=len(queries[k]), queries_a=queries[k],
            return_idx=True, return_cycle_error=True))

    eng = FasterSparseEngine(runner, mode="tile", task_bucket=64,
                             max_load=64)
    multi = eng.cotr_corr_multiscale_with_cycle_consistency_multipair(
        pairs, zoom_ins=[0.5, 0.25], max_corrs=len(queries[0]),
        queries_list=queries, return_idx=True, return_cycle_error=True,
        pair_seeds=seeds)

    for k in range(len(pairs)):
        corr_s, idx_s, cyc_s = serial[k]
        corr_m, idx_m, cyc_m = multi[k]
        assert corr_m.shape == corr_s.shape
        np.testing.assert_array_equal(np.sort(idx_m), np.sort(idx_s))
        os_, om = np.argsort(idx_s), np.argsort(idx_m)
        np.testing.assert_allclose(corr_m[om], corr_s[os_], atol=5e-3,
                                   err_msg=f"pair {k}")
        np.testing.assert_allclose(cyc_m[om], cyc_s[os_], atol=5e-3)


def test_corr_base_many_matches_serial_oracle():
    """The batched corr_base_many must equal a direct serial transcription
    of the reference loop (cotr_corr_base, inference_helper.py:185-232:
    one encode + forward/cycle decode per patch-pair) on identical inputs
    (VERDICT r3 weak #5 / next #6: O(1) dispatches, equal outputs)."""
    from cotr_tpu.inference.dense import _canvas_from_pair, to_square_patches

    runner = ModelRunner(ContentStubModel(), params={}, decode_chunk=16384)
    rng = np.random.RandomState(9)
    jobs = []
    # non-square pairs (2x2 patch-pairs each) + differing query counts:
    # >8 total canvases exercises the chunk padding, ragged N the query pad
    for n_q, (h, w) in [(10, (300, 440)), (7, (320, 320)),
                        (13, (288, 400))]:
        img_a = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        img_b = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        q = rng.uniform(20, min(h, w) - 20, (n_q, 2))
        jobs.append((img_a, img_b, q))

    def serial_oracle(img_a, img_b, queries_a):
        preds = []
        for p_i in to_square_patches(np.asarray(img_a)):
            q = np.asarray(queries_a, np.float64)
            in_patch = ((q[:, 0] >= p_i.x) & (q[:, 1] >= p_i.y) &
                        (q[:, 0] <= p_i.x + p_i.w) &
                        (q[:, 1] <= p_i.y + p_i.h))
            qn = np.stack([(q[:, 0] - p_i.x) / (2 * p_i.w),
                           (q[:, 1] - p_i.y) / p_i.h], axis=1)
            for p_j in to_square_patches(np.asarray(img_b)):
                canvas = _canvas_from_pair(p_i.patch, p_j.patch)
                mem = runner.encode(canvas)
                out = np.asarray(runner.decode(
                    mem, qn[None].astype(np.float32)))[0]
                cycle = np.asarray(runner.decode(mem, out[None]))[0]
                conf = np.linalg.norm(qn - cycle, axis=1)
                conf[~in_patch] = np.inf
                preds.append(np.stack([
                    (out[:, 0] - 0.5) * 2 * p_j.w + p_j.x,
                    out[:, 1] * p_j.h + p_j.y, conf], axis=1))
        preds = np.stack(preds)
        best = preds[np.argmin(preds[..., 2], axis=0),
                     np.arange(preds.shape[1])]
        return np.concatenate([queries_a, best[:, :2]], axis=1)

    eng = SparseEngine(runner, mode="tile")
    batched = eng.corr_base_many(jobs)
    for k, (img_a, img_b, q) in enumerate(jobs):
        expect = serial_oracle(img_a, img_b, q)
        assert batched[k].shape == expect.shape
        np.testing.assert_allclose(batched[k], expect, atol=1e-4,
                                   err_msg=f"job {k}")


def test_collect_diagnostics_hook(stub_runner):
    """Opt-in diagnostics must expose the full zoom history in task order
    plus the filters' would-keep verdicts (tools/diagnose_tail.py)."""
    eng = SparseEngine(stub_runner, mode="tile", task_bucket=64)
    eng.collect_diagnostics = True
    rng = np.random.RandomState(4)
    img = rng.uniform(0, 255, (512, 512, 3)).astype(np.uint8)
    queries = rng.uniform(30, 480, (16, 2))
    eng.cotr_corr_multiscale(img, img, zoom_ins=[0.5, 0.25], max_corrs=16,
                             queries_a=queries, force=True)
    d = eng.last_diag
    assert d["history"].shape == (3, 16, 2)  # seed + 2 zoom levels
    assert d["ident"].tolist() == list(range(16))
    assert d["kept_by_filters"].shape == (16,)
    # identity stub: refinement stays near the query -> filters keep most
    assert d["kept_by_filters"].sum() >= 12


def test_cycle_select_recovers_diverged_tasks(stub_runner):
    """cycle_select must pick, per query, the history row with the smallest
    reverse cycle error. The reverse pass is faked with a content-aware
    oracle (the identity stub is content-blind: a wrong candidate's patch
    still reverse-maps to the a-crop center, so it cannot discriminate);
    the oracle reverse-maps every candidate to its true preimage, making
    cycle error == candidate error, so argmin must recover the accurate row
    regardless of position (seed or final)."""
    eng = SparseEngine(stub_runner, mode="tile", task_bucket=64)
    rng = np.random.RandomState(5)
    img = rng.uniform(0, 255, (512, 512, 3)).astype(np.uint8)
    loc_from = rng.uniform(60, 450, (8, 2))
    good = loc_from.copy()                       # identity ground truth
    bad = good + np.array([80.0, -60.0])         # diverged final estimate
    history = np.stack([good, bad], axis=0)      # (C=2, T, 2)
    # mix rows so the accurate candidate is NOT always first (no tie help)
    swap = np.arange(8) % 2 == 1
    history[0, swap], history[1, swap] = bad[swap], good[swap]

    def oracle_refine_all(img_a, img_b, lf, lt, aa, ab, zi, ci):
        # reverse pass oracle: candidate at its true preimage + its error
        pred_a = np.asarray(lt) + (np.asarray(lf) - np.tile(good, (2, 1)))
        return np.stack([np.asarray(lt), pred_a], axis=0)

    eng._refine_all = oracle_refine_all
    sel, cyc = eng._cycle_select(img, img, loc_from, history,
                                 512 * 512, 512 * 512, 0.5)
    assert cyc.shape == (2, 8)
    np.testing.assert_allclose(sel, good, atol=1e-9)
    # per-query: the corrupted candidate's cycle error dominates
    assert (cyc.max(axis=0) > cyc.min(axis=0) + 10).all()


def test_cycle_select_never_picks_out_of_frame_candidate(stub_runner):
    """An out-of-frame candidate (e.g. a marginally-out-of-image dense seed)
    must lose the selection even when its cycle error is smallest."""
    eng = SparseEngine(stub_runner, mode="tile", task_bucket=64)
    rng = np.random.RandomState(7)
    img = rng.uniform(0, 255, (512, 512, 3)).astype(np.uint8)
    loc_from = rng.uniform(60, 450, (4, 2))
    inframe = loc_from.copy()
    outframe = inframe.copy()
    outframe[:, 0] = -3.0                          # x just outside img_b
    history = np.stack([outframe, inframe], axis=0)

    def oracle_refine_all(img_a, img_b, lf, lt, aa, ab, zi, ci):
        # give the OOB row (first half of the flattened candidates) a
        # perfect cycle error and the in-frame row a small nonzero one
        pred_a = np.asarray(lt).copy()
        pred_a[4:] += 2.0
        return np.stack([np.asarray(lt), pred_a], axis=0)

    eng._refine_all = oracle_refine_all
    sel, cyc = eng._cycle_select(img, img, loc_from, history,
                                 512 * 512, 512 * 512, 0.5)
    assert (cyc[0] < cyc[1]).all()                 # OOB row "wins" on error
    np.testing.assert_allclose(sel, inframe, atol=1e-9)  # ...but is rejected


def test_cycle_select_end_to_end_no_harm(stub_runner):
    """With an accurate model, cycle_select must not disturb results."""
    eng = SparseEngine(stub_runner, mode="tile", task_bucket=64)
    rng = np.random.RandomState(6)
    img = rng.uniform(0, 255, (512, 512, 3)).astype(np.uint8)
    queries = rng.uniform(30, 480, (16, 2))
    kw = dict(zoom_ins=[0.5, 0.25], max_corrs=16, queries_a=queries,
              force=True)
    ref = eng.cotr_corr_multiscale(img, img, **kw)
    out = eng.cotr_corr_multiscale(img, img, cycle_select=True, **kw)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out[:, 2:], out[:, :2], atol=1.5)


def test_cycle_select_rescue_keeps_healthy_answers(stub_runner):
    """cycle_select="rescue" must leave queries that pass the std/border
    filters untouched (the converged answer) and apply candidate selection
    only to flagged ones — the mode that improves the tail without paying
    the measured median cost of full replacement (PERF.md §10)."""
    eng = SparseEngine(stub_runner, mode="tile", task_bucket=64)
    rng = np.random.RandomState(9)
    img = rng.uniform(0, 255, (512, 512, 3)).astype(np.uint8)
    queries = rng.uniform(60, 450, (12, 2))

    # the identity stub converges near the query -> all queries healthy;
    # rescue must then return exactly the plain force=True answers even
    # when the reverse pass would prefer a different (corrupted) candidate
    plain = eng.cotr_corr_multiscale(img, img, zoom_ins=[0.5, 0.25],
                                     max_corrs=12, queries_a=queries.copy(),
                                     force=True)
    orig_cs = eng._cycle_select
    eng._cycle_select = lambda *a, **k: (
        np.full((12, 2), -77.0), np.zeros((3, 12)))
    rescued = eng.cotr_corr_multiscale(img, img, zoom_ins=[0.5, 0.25],
                                       max_corrs=12,
                                       queries_a=queries.copy(),
                                       force=True, cycle_select="rescue")
    np.testing.assert_allclose(rescued, plain, atol=1e-9)
    # sanity: full replacement WOULD have taken the corrupted override
    replaced = eng.cotr_corr_multiscale(img, img, zoom_ins=[0.5, 0.25],
                                        max_corrs=12,
                                        queries_a=queries.copy(),
                                        force=True, cycle_select=True)
    assert (replaced[:, 2:] == -77.0).all()
    eng._cycle_select = orig_cs
