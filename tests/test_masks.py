"""Mask geometry: intersect_mask targets, paste-back, IoU, mask voting."""

import numpy as np
import jax.numpy as jnp

from mnc_tpu.ops.masks import crop_resize_from_canvas, intersect_mask, mask_overlap, paste_masks
from mnc_tpu.ops.mask_pooling import mask_pooling
from mnc_tpu.ops.mask_voting import mask_voting


def test_mask_overlap_oracle(rng):
    a = (rng.uniform(size=(5, 20, 20)) > 0.5).astype(np.float32)
    b = (rng.uniform(size=(5, 20, 20)) > 0.5).astype(np.float32)
    got = np.asarray(mask_overlap(a, b))
    for i in range(5):
        inter = np.logical_and(a[i] > 0.5, b[i] > 0.5).sum()
        union = np.logical_or(a[i] > 0.5, b[i] > 0.5).sum()
        np.testing.assert_allclose(got[i], inter / max(union, 1), rtol=1e-6)


def test_intersect_mask_full_roi_equals_gt():
    """RoI == gt box -> target is (a resample of) the gt mask itself."""
    s, m = 28, 14
    gt_mask = np.zeros((1, s, s), np.float32)
    gt_mask[0, : s // 2] = 1.0  # top half on
    gt_box = np.array([[10.0, 20.0, 10.0 + 55.0, 20.0 + 55.0]], np.float32)
    out = np.asarray(intersect_mask(gt_box, gt_box, gt_mask, m))
    np.testing.assert_allclose(out[0, : m // 2].mean(), 1.0, atol=1e-6)
    np.testing.assert_allclose(out[0, m // 2 :].mean(), 0.0, atol=1e-6)


def test_intersect_mask_roi_outside_gt_is_zero():
    s, m = 28, 14
    gt_mask = np.ones((1, s, s), np.float32)
    gt_box = np.array([[0.0, 0.0, 20.0, 20.0]], np.float32)
    roi = np.array([[100.0, 100.0, 140.0, 140.0]], np.float32)
    out = np.asarray(intersect_mask(roi, gt_box, gt_mask, m))
    assert out.sum() == 0.0


def test_intersect_mask_partial_overlap():
    """RoI covering the right half of a fully-on gt mask: left half of the
    RoI (outside the gt box) must be 0, the part inside ~1."""
    s, m = 28, 14
    gt_mask = np.ones((1, s, s), np.float32)
    gt_box = np.array([[0.0, 0.0, 27.0, 27.0]], np.float32)
    roi = np.array([[14.0, 0.0, 41.0, 27.0]], np.float32)  # right half + beyond
    out = np.asarray(intersect_mask(roi, gt_box, gt_mask, m, binarize=True))
    assert out[0, :, : m // 2 - 1].mean() > 0.9  # inside gt box
    assert out[0, :, m // 2 + 1 :].mean() < 0.1  # beyond gt box


def test_paste_masks_simple():
    """A fully-on 7x7 mask pasted into a box covers ~the box, 0 elsewhere."""
    mask = np.ones((1, 7, 7), np.float32)
    box = np.array([[10.0, 20.0, 29.0, 39.0]], np.float32)
    out = np.array(paste_masks(mask, box, (64, 64), binarize_thresh=0.4))[0]
    assert out[20:40, 10:30].mean() > 0.99
    out[20:40, 10:30] = 0
    assert out.sum() == 0


def test_paste_then_crop_roundtrip(rng):
    """crop_resize_from_canvas(paste(mask)) ~ mask for a smooth mask."""
    m = 21
    yy, xx = np.mgrid[0:m, 0:m].astype(np.float32) / (m - 1)
    mask = (np.sin(3 * yy) * np.cos(2 * xx) * 0.5 + 0.5)[None]
    box = np.array([[8.0, 12.0, 8.0 + 62.0, 12.0 + 41.0]], np.float32)
    canvas = np.asarray(paste_masks(mask, box, (80, 96)))
    back = np.asarray(crop_resize_from_canvas(canvas, box, m))
    err = np.abs(back - mask)[0, 2:-2, 2:-2]  # ignore border bins
    assert err.mean() < 0.05


def test_mask_pooling_grads_both_inputs(rng):
    import jax

    f = jnp.asarray(rng.randn(3, 7, 7, 4).astype(np.float32))
    mk = jnp.asarray(rng.uniform(size=(3, 7, 7)).astype(np.float32))
    gf, gm = jax.grad(lambda a, b: jnp.sum(mask_pooling(a, b) ** 2), argnums=(0, 1))(f, mk)
    assert np.abs(np.asarray(gf)).sum() > 0 and np.abs(np.asarray(gm)).sum() > 0


def test_mask_voting_identity():
    """Single candidate == kept box: merged mask equals (a resample of) it."""
    m = 14
    mask = np.zeros((1, m, m), np.float32)
    mask[0, :, : m // 2] = 1.0
    box = np.array([[5.0, 5.0, 60.0, 60.0]], np.float32)
    out = np.asarray(
        mask_voting(box, box, np.array([0.9], np.float32), mask, np.array([True]))
    )
    np.testing.assert_allclose(out[0, :, : m // 2 - 1], 1.0, atol=1e-4)
    np.testing.assert_allclose(out[0, :, m // 2 + 1 :], 0.0, atol=1e-4)


def test_mask_voting_weighted_average():
    """Two aligned candidates: result is the score-weighted average."""
    m = 8
    box = np.array([[0.0, 0.0, 31.0, 31.0]], np.float32)
    cboxes = np.concatenate([box, box])
    masks = np.stack([np.zeros((m, m), np.float32), np.ones((m, m), np.float32)])
    scores = np.array([1.0, 3.0], np.float32)
    out = np.asarray(mask_voting(box, cboxes, scores, masks, np.ones(2, bool)))
    np.testing.assert_allclose(out, 0.75, atol=1e-4)


def test_mask_voting_ignores_far_candidates():
    m = 8
    kept = np.array([[0.0, 0.0, 31.0, 31.0]], np.float32)
    cboxes = np.array([[0.0, 0.0, 31.0, 31.0], [200.0, 200.0, 231.0, 231.0]], np.float32)
    masks = np.stack([np.full((m, m), 0.2, np.float32), np.ones((m, m), np.float32)])
    scores = np.array([1.0, 5.0], np.float32)
    out = np.asarray(mask_voting(kept, cboxes, scores, masks, np.ones(2, bool)))
    np.testing.assert_allclose(out, 0.2, atol=1e-4)


def test_mask_voting_per_det_gather_matches_einsum(rng):
    """The 2-tap gather resample equals the hat-matmul one to f32 rounding,
    including degenerate/inverted/out-of-frame candidate boxes."""
    from mnc_tpu.ops.mask_voting import mask_voting_per_det

    n, cv, m = 12, 6, 21
    x1 = rng.uniform(0, 900, (n,)); y1 = rng.uniform(0, 550, (n,))
    kept = np.stack([x1, y1, x1 + rng.uniform(16, 300, n),
                     y1 + rng.uniform(16, 200, n)], -1).astype(np.float32)
    cand = np.repeat(kept[:, None, :], cv, 1).astype(np.float32)
    cand += rng.uniform(-30, 30, cand.shape).astype(np.float32)
    cand[0, 1] = [500, 400, 460, 380]      # inverted
    cand[1, 2] = [0, 0, 0, 0]              # degenerate
    cand[2, 3] = [-900, -500, -800, -450]  # far outside the kept frame
    scores = rng.uniform(size=(n, cv)).astype(np.float32)
    masks = rng.uniform(size=(n, cv, m, m)).astype(np.float32)

    a = np.asarray(mask_voting_per_det(kept, cand, scores, masks, impl="einsum"))
    b = np.asarray(mask_voting_per_det(kept, cand, scores, masks, impl="gather"))
    np.testing.assert_allclose(a, b, atol=2e-6)
