"""Engine modes on NON-SQUARE images: tile (2-patch exhaustive merge) and
stretching (host field resizes) — the round-1 untested coordinate-risk paths
(VERDICT.md weak #4).

Method: an identity stub model. Its decode predicts the same position in the
other canvas half (exact identity correspondence) whenever the two halves
hold the SAME content, and an out-of-bounds constant otherwise — so
cross-patch pairs in tile mode produce large cycle errors and lose the
min-confidence merge (inference_helper.py:61-75), exactly as a trained model
would. With img_b = img_a, every engine mode must then return the identity
correspondence; any sign/scale error in the patch affines
(dense.py:_patch_affine), the stretch resizes (engine.py:_dense_fields), or
the patch-local query/denorm plumbing (refine.py/grouped.py) breaks identity
by many pixels.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cotr_tpu.inference.dense import dense_flow, to_square_patches
from cotr_tpu.inference.engine import FasterSparseEngine, SparseEngine


class IdentityModel:
    """Flax-like .apply supporting encode/decode/full-forward, jit-traceable.

    encode: memory IS the canvas. decode: identity across canvas halves when
    both halves match, else -1 (out of bounds -> huge cycle error).
    """

    cfg = None  # engines probe .cfg.dtype; None -> float32 crops

    def apply(self, variables, *args, method=None):
        if method == "encode":
            (canvas,) = args
            return canvas
        if method == "decode":
            memory, queries = args
            return self._decode(memory, queries)
        canvas, queries = args
        return self._decode(canvas, queries)

    @staticmethod
    def _decode(canvas, queries):
        left = canvas[:, :, :256]
        right = canvas[:, :, 256:]
        # "same content" must tolerate the ~1px box offsets the stretching
        # seed pass introduces (shifted smooth content diffs ~0.2-0.4 in
        # ImageNet-normalized units; distinct patches differ by ~1.5)
        same = jnp.mean(jnp.abs(left - right), axis=(1, 2, 3)) < 0.5  # (B,)
        qx, qy = queries[..., 0], queries[..., 1]
        ident_x = jnp.where(qx < 0.5, qx + 0.5, qx - 0.5)
        pred = jnp.stack([ident_x, qy], axis=-1)
        return jnp.where(same[:, None, None], pred,
                         jnp.full_like(pred, -1.0))


class IdentityRunner:
    """ModelRunner-compatible facade over IdentityModel."""

    def __init__(self):
        self.model = IdentityModel()
        self.params = {}
        self.decode_chunk = 16384  # fused dense path reads this (dense.py)

    def encode(self, canvas):
        return jnp.asarray(canvas)

    def decode(self, memory, queries):
        return self.model._decode(memory, jnp.asarray(queries))

    def decode_chunked(self, memory, queries):
        return self.decode(memory, queries)

    def forward(self, canvas, queries):
        return self.model.apply({}, jnp.asarray(canvas),
                                jnp.asarray(queries))


@pytest.fixture(scope="module")
def nonsquare_image():
    """Smooth non-square (200 x 300) uint8 image, asymmetric content so the
    two tile patches differ."""
    import PIL.Image

    rng = np.random.RandomState(7)
    small = rng.randint(0, 255, (10, 15, 3), np.uint8)
    return np.asarray(PIL.Image.fromarray(small).resize(
        (300, 200), PIL.Image.BILINEAR))


def test_to_square_patches_nonsquare(nonsquare_image):
    patches = to_square_patches(nonsquare_image)
    assert len(patches) == 2
    assert patches[0].patch.shape == (200, 200, 3)
    assert (patches[0].x, patches[0].y) == (0, 0)
    assert (patches[1].x, patches[1].y) == (100, 0)


def test_dense_flow_tile_identity_nonsquare(nonsquare_image):
    """Exhaustive 2x2 patch pairs + affine merge must reproduce the identity
    flow over the full non-square frame."""
    runner = IdentityRunner()
    corr_a, con_a, corr_b, con_b = dense_flow(runner, nonsquare_image,
                                              nonsquare_image)
    h, w = nonsquare_image.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w]
    # identity flow in the other image's [-1, 1] coords
    exp_x = (xs + 0.5) / w * 2 - 1
    exp_y = (ys + 0.5) / h * 2 - 1
    # interior only: patch borders see resize ramp effects
    sl = np.s_[20:-20, 20:-20]
    err_x = np.abs(corr_a[..., 0] - exp_x)[sl] * w / 2
    err_y = np.abs(corr_a[..., 1] - exp_y)[sl] * h / 2
    assert err_x.max() < 2.0, f"x err {err_x.max():.2f}px"
    assert err_y.max() < 2.0, f"y err {err_y.max():.2f}px"
    assert con_a[sl].max() < 0.05  # confident everywhere inside


def test_dense_flow_many_remainder_matches_per_pair(nonsquare_image):
    """dense_flow_many with a non-divisible job count (remainder chunk gets
    PADDED to canvas_batch for shape stability) must equal per-pair
    dense_flow exactly — the padding canvases must never leak into results."""
    from cotr_tpu.inference.dense import dense_flow_many

    runner = IdentityRunner()
    rng = np.random.RandomState(11)
    other = np.clip(nonsquare_image.astype(np.int16) +
                    rng.randint(-8, 8, nonsquare_image.shape),
                    0, 255).astype(np.uint8)
    # 3 non-square pairs -> 3 * (2x2 patch pairs) = 12 jobs; canvas_batch=8
    # leaves a remainder chunk of 4
    pairs = [(nonsquare_image, nonsquare_image),
             (other, other),
             (nonsquare_image, other)]
    many = dense_flow_many(runner, pairs, canvas_batch=8)
    assert len(many) == 3
    for k, (img_a, img_b) in enumerate(pairs):
        single = dense_flow(runner, img_a, img_b)
        for got, want in zip(many[k], single):
            np.testing.assert_allclose(got, want, atol=1e-6,
                                       err_msg=f"pair {k}")


@pytest.mark.parametrize("engine_cls", [SparseEngine, FasterSparseEngine])
@pytest.mark.parametrize("mode", ["tile", "stretching"])
def test_engine_identity_nonsquare(nonsquare_image, engine_cls, mode):
    """Full engine on a non-square pair must return identity correspondences
    through seeding, zoom refinement and conclude in BOTH modes."""
    runner = IdentityRunner()
    engine = engine_cls(runner, batch_size=32, mode=mode, task_bucket=8)
    rng = np.random.RandomState(3)
    queries = np.stack([rng.uniform(60, 240, 12),
                        rng.uniform(60, 140, 12)], axis=1)
    corrs, idx = engine.cotr_corr_multiscale(
        nonsquare_image, nonsquare_image, zoom_ins=[0.5, 0.25],
        max_corrs=12, queries_a=queries, force=False, return_idx=True)
    assert corrs.shape[0] == 12, f"{mode}: lost tasks {corrs.shape}"
    err = np.abs(corrs[:, 2:] - corrs[:, :2])
    assert err.max() < 1.5, (
        f"{engine_cls.__name__}/{mode}: identity broken by {err.max():.2f}px")
    np.testing.assert_array_equal(np.sort(idx), np.arange(12))


@pytest.mark.slow
def test_safe_area_knob_groups_more_and_stays_exact(nonsquare_image):
    """safe_area > 0.5 (production knob; reference hardcodes 0.5) must form
    FEWER squads (more members per canvas encode) and, for the identity
    correspondence, remain exact — member queries are re-normalized into the
    pilot's frame, so grouping radius does not move identity predictions."""
    from cotr_tpu.inference.engine import FasterSparseEngine

    img = nonsquare_image
    rng = np.random.RandomState(3)
    queries = np.stack([rng.uniform(40, 260, 40),
                        rng.uniform(40, 160, 40)], axis=1)
    kw = dict(zoom_ins=[0.5, 0.25], converge_iters=1, max_corrs=40,
              queries_a=queries.copy(), force=True)

    eng_ref = FasterSparseEngine(IdentityRunner(), mode="tile",
                                 task_bucket=64, safe_area=0.5)
    corrs_ref = eng_ref.cotr_corr_multiscale(img, img, **kw)
    eng_wide = FasterSparseEngine(IdentityRunner(), mode="tile",
                                  task_bucket=64, safe_area=1.0)
    corrs_wide = eng_wide.cotr_corr_multiscale(img, img, **kw)

    # identity exactness in both regimes
    np.testing.assert_allclose(corrs_ref[:, 2:], corrs_ref[:, :2], atol=1.0)
    np.testing.assert_allclose(corrs_wide[:, 2:], corrs_wide[:, :2],
                               atol=1.0)
    # wider window -> fewer canvas encodes (tracked via total task count
    # proxy: same) — assert squad counts directly
    from cotr_tpu.inference.grouped import form_squads

    loc = queries.astype(np.float64)
    _, pilots_ref = form_squads(loc, loc, np.ones(len(loc), bool), 0.5, 0.5,
                                img.shape[:2], img.shape[:2], 256,
                                np.random.RandomState(0), safe_area=0.5)
    _, pilots_wide = form_squads(loc, loc, np.ones(len(loc), bool), 0.5, 0.5,
                                 img.shape[:2], img.shape[:2], 256,
                                 np.random.RandomState(0), safe_area=1.0)
    assert len(pilots_wide) < len(pilots_ref)


def test_safe_area_validation():
    """Out-of-domain safe_area values must be rejected: above 1.0 members
    leave the pilot patch (queries outside the canvas domain), at/below 0
    grouping is meaningless (and used to reach a native abort)."""
    from cotr_tpu.inference.engine import FasterSparseEngine

    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            FasterSparseEngine(IdentityRunner(), safe_area=bad)


def test_dense_flow_many_seed_stride_coarse_grid(nonsquare_image):
    """seed_stride > 1 decodes a subsampled grid and upsamples on device;
    on smooth (identity) flow the coarse seed field must agree with the
    full-grid field to a couple of px — the contract that lets the engine
    trade seed resolution for the 82%-of-wall decode cost in small-query
    multipair jobs (evals/triage_multipair_r5.json)."""
    from cotr_tpu.inference.dense import dense_flow_many

    runner = IdentityRunner()
    pairs = [(nonsquare_image, nonsquare_image)]
    full = dense_flow_many(runner, pairs, seed_stride=1)[0]
    coarse = dense_flow_many(runner, pairs, seed_stride=4)[0]
    h, w = nonsquare_image.shape[:2]
    sl = np.s_[20:-20, 20:-20]
    # corr fields are normalized [-1,1] per image: convert to px
    dx = np.abs(full[0][..., 0] - coarse[0][..., 0])[sl] * w / 2
    dy = np.abs(full[0][..., 1] - coarse[0][..., 1])[sl] * h / 2
    # quantile bound, not max: at coarse stride the upsampled cycle
    # confidence can let a mismatched-patch sentinel win the
    # min-confidence merge on O(1) isolated pixels near the tile seam
    # (measured: ~5e-5 of pixels); those seeds are refined or filtered by
    # the engine's zoom levels, so the seeding contract is quantile-level
    assert np.quantile(dx, 0.999) < 3.0, f"x q99.9 {np.quantile(dx, 0.999):.2f}px"
    assert np.quantile(dy, 0.999) < 3.0, f"y q99.9 {np.quantile(dy, 0.999):.2f}px"
    assert np.median(dx) < 1.0 and np.median(dy) < 1.0
    # confidence stays confident on the smooth field (same rare-pixel bound)
    assert np.quantile(coarse[1][sl], 0.999) < 0.1


def test_engine_seed_stride_end_to_end(nonsquare_image):
    """The engine's seed_stride knob must run end-to-end and stay within
    refinement reach of the stride-1 answer on identity flow."""
    runner = IdentityRunner()
    q = np.stack([np.random.RandomState(3).uniform(30, 200, 24),
                  np.random.RandomState(4).uniform(30, 200, 24)], axis=1)
    eng = FasterSparseEngine(runner, mode="tile", seed_stride=4)
    corrs = eng.cotr_corr_multiscale(
        nonsquare_image, nonsquare_image, zoom_ins=[0.5],
        queries_a=q.copy(), force=True, max_corrs=24)
    err = np.abs(corrs[:, 2:] - corrs[:, :2]).max()
    assert corrs.shape[0] == 24
    assert err < 4.0, f"identity deviation {err:.2f}px with seed_stride=4"


def test_canvases_for_jobs_float_fallback_matches_batched():
    """_canvases_for_jobs: the batched uint8 path and the per-pair float
    fallback must produce identical canvases for the same content."""
    from cotr_tpu.inference.dense import _canvases_for_jobs

    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 255, (120, 120, 3), np.uint8) for _ in range(4)]
    pairs = [(imgs[0], imgs[1]), (imgs[2], imgs[3])]
    batched = np.asarray(_canvases_for_jobs(pairs))
    fallback = np.asarray(_canvases_for_jobs(
        [(a.astype(np.float32) * 1.0, b.astype(np.float32) * 1.0)
         for a, b in pairs]))
    assert batched.shape == fallback.shape == (2, 256, 512, 3)
    np.testing.assert_allclose(batched, fallback, atol=2e-5)
