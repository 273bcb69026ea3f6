"""Fixed-shape on-device NMS vs the classic greedy oracle.

The oracle below is the reference ``lib/nms/cpu_nms.pyx`` algorithm in numpy;
nms_fixed must make identical selections (SURVEY.md §4 "NMS vs numpy oracle").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnc_tpu.ops.nms import nms_fixed, nms_indices
from tests.conftest import random_boxes


def greedy_nms_oracle(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        iw = np.minimum(boxes[i, 2], boxes[:, 2]) - np.maximum(boxes[i, 0], boxes[:, 0]) + 1
        ih = np.minimum(boxes[i, 3], boxes[:, 3]) - np.maximum(boxes[i, 1], boxes[:, 1]) + 1
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > thresh
        suppressed[i] = False
    return np.array(keep)  # in selection (descending-score) order


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_nms_matches_oracle(seed, thresh):
    rs = np.random.RandomState(seed)
    n = 128
    boxes = random_boxes(rs, n)
    scores = rs.uniform(size=n).astype(np.float32)

    order = np.argsort(-scores, kind="stable")
    sorted_boxes = boxes[order]
    keep_mask = np.asarray(nms_fixed(sorted_boxes, np.ones(n, dtype=bool), thresh))
    got = np.sort(order[keep_mask])
    want = np.sort(greedy_nms_oracle(boxes, scores, thresh))
    np.testing.assert_array_equal(got, want)


def test_nms_respects_validity(rng):
    n = 64
    boxes = random_boxes(rng, n)
    scores = rng.uniform(size=n).astype(np.float32)
    valid = np.arange(n) < 40

    idx, kv = nms_indices(boxes, scores, valid, 0.5, top_n=32)
    idx, kv = np.asarray(idx), np.asarray(kv)
    # No invalid box may be selected.
    assert np.all(idx[kv] < 40)
    # Selections must equal the oracle run on the valid subset.
    want = greedy_nms_oracle(boxes[:40], scores[:40], 0.5)[:32]
    np.testing.assert_array_equal(np.sort(idx[kv]), np.sort(want))
    # Returned in descending score order.
    s = scores[idx[kv]]
    assert np.all(np.diff(s) <= 1e-6)


def test_nms_duplicate_boxes():
    # Identical boxes: exactly one survives.
    boxes = np.tile(np.array([[10.0, 10.0, 50.0, 50.0]], np.float32), (8, 1))
    keep = np.asarray(nms_fixed(boxes, np.ones(8, bool), 0.5))
    assert keep.sum() == 1 and keep[0]


def test_nms_chain_suppression():
    # a suppresses b, b would suppress c, but b is gone -> c survives.
    boxes = np.array(
        [
            [0, 0, 100, 100],
            [50, 0, 150, 100],  # IoU(a,b) ~ 0.34 > 0.3 -> suppressed by a
            [100, 0, 200, 100],  # IoU(a,c) ~ 0.005; IoU(b,c) ~ 0.34 -> must survive
        ],
        dtype=np.float32,
    )
    keep = np.asarray(nms_fixed(boxes, np.ones(3, bool), 0.3))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_wrapper_host_api(rng):
    """Reference lib/nms/nms_wrapper.py API: (N,5) dets -> kept indices."""
    from mnc_tpu.ops.nms_wrapper import apply_nms, nms

    boxes = random_boxes(rng, 60)
    scores = rng.uniform(size=60).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    keep = nms(dets, 0.5)
    want = greedy_nms_oracle(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.sort(keep), np.sort(want))
    # kept in descending score order
    assert np.all(np.diff(scores[keep]) <= 1e-6)

    all_boxes = [[dets, np.zeros((0, 5), np.float32)]]
    out = apply_nms(all_boxes, 0.5)
    assert len(out[0][0]) == len(keep)


def test_pallas_nms_matches_fixed(rng):
    """The Pallas NMS kernel (interpret on CPU) matches the fixpoint NMS."""
    from mnc_tpu.ops.pallas.nms_kernel import nms_pallas

    n = 64
    boxes = random_boxes(rng, n)
    scores = rng.uniform(size=n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sb = boxes[order]
    valid = np.ones(n, bool)
    a = np.asarray(nms_fixed(sb, valid, 0.5))
    b = np.asarray(nms_pallas(sb, valid, 0.5))
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# tiled NMS (reference-scale working sets)
# ---------------------------------------------------------------------------

def _oracle_keep_topn(boxes, thresh, top_n):
    """numpy greedy NMS on score-sorted boxes; first top_n kept indices."""
    kept = []
    for j in range(len(boxes)):
        x1, y1, x2, y2 = boxes[j]
        area_j = (x2 - x1 + 1) * (y2 - y1 + 1)
        ok = True
        for i in kept:
            a = boxes[i]
            xx1, yy1 = max(a[0], x1), max(a[1], y1)
            xx2, yy2 = min(a[2], x2), min(a[3], y2)
            w, h = max(0.0, xx2 - xx1 + 1), max(0.0, yy2 - yy1 + 1)
            inter = w * h
            area_i = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
            if inter / (area_i + area_j - inter) > thresh:
                ok = False
                break
        if ok:
            kept.append(j)
    return kept[:top_n]


@pytest.mark.parametrize("k,chunk,top_n,thresh", [
    (3000, 512, 300, 0.7),
    (2048, 512, 64, 0.5),   # buffer fills mid-stream
    (1500, 1024, 300, 0.3),
    (700, 1024, 100, 0.7),  # K < chunk → falls back to nms_fixed path
])
def test_nms_tiled_matches_oracle(k, chunk, top_n, thresh):
    rs = np.random.RandomState(k + top_n)
    boxes = np.stack([
        rs.uniform(0, 400, k), rs.uniform(0, 300, k),
        np.zeros(k), np.zeros(k)], axis=1).astype(np.float32)
    boxes[:, 2] = boxes[:, 0] + rs.uniform(4, 120, k)
    boxes[:, 3] = boxes[:, 1] + rs.uniform(4, 120, k)
    scores = rs.uniform(size=k).astype(np.float32)
    valid = rs.uniform(size=k) > 0.05

    idx, kv = jax.jit(
        lambda b, s, v: nms_indices(b, s, v, thresh, top_n, chunk=chunk)
    )(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    idx, kv = np.asarray(idx), np.asarray(kv)

    order = np.argsort(-np.where(valid, scores, -np.inf), kind="stable")
    order = order[valid[order]]
    oracle_sorted = _oracle_keep_topn(boxes[order], thresh, top_n)
    expected = order[oracle_sorted]
    got = idx[kv]
    np.testing.assert_array_equal(got, expected)


def test_nms_tiled_equals_fixed_small():
    rs = np.random.RandomState(0)
    k = 1024
    boxes = np.stack([
        rs.uniform(0, 200, k), rs.uniform(0, 200, k),
        np.zeros(k), np.zeros(k)], axis=1).astype(np.float32)
    boxes[:, 2] = boxes[:, 0] + rs.uniform(4, 60, k)
    boxes[:, 3] = boxes[:, 1] + rs.uniform(4, 60, k)
    scores = rs.uniform(size=k).astype(np.float32)
    valid = np.ones(k, bool)
    i1, v1 = nms_indices(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(valid), 0.7, 300)
    i2, v2 = nms_indices(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(valid), 0.7, 300, chunk=256)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1)[np.asarray(v1)],
                                  np.asarray(i2)[np.asarray(v2)])


def test_nms_tiled_all_overlapping():
    # one giant pile: only the top-scored box survives
    boxes = jnp.tile(jnp.asarray([[10.0, 10.0, 50.0, 50.0]]), (2000, 1))
    scores = jnp.linspace(1.0, 0.1, 2000)
    valid = jnp.ones((2000,), bool)
    idx, kv = nms_indices(boxes, scores, valid, 0.5, 10, chunk=512)
    assert int(np.asarray(kv).sum()) == 1
    assert int(np.asarray(idx)[0]) == 0


@pytest.mark.parametrize("k,top_n,chunk", [(64, 16, None), (300, 32, 64)])
def test_nms_indices_presorted_equals_sorted(rng, k, top_n, chunk):
    """presorted=True on top_k-ordered inputs == the argsort path exactly
    (the propose_rois fast path; also the workaround for the TPU worker
    fault at some canvas grids — see nms_indices docstring)."""
    boxes = random_boxes(rng, k)
    scores = jnp.asarray(rng.rand(k).astype(np.float32))
    valid = jnp.asarray(rng.rand(k) > 0.3)
    # emulate propose_rois: top_k over masked scores -> sorted, padding last
    neg_inf = jnp.finfo(jnp.float32).min
    masked = jnp.where(valid, scores, neg_inf)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    top_boxes = boxes[top_idx]
    top_valid = top_scores > neg_inf
    ref = nms_indices(top_boxes, top_scores, top_valid, 0.5, top_n, chunk=chunk)
    fast = nms_indices(top_boxes, top_scores, top_valid, 0.5, top_n,
                       chunk=chunk, presorted=True)
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(fast[1]))
    # padding idx may differ only where keep_valid is False and both point
    # at a valid box; compare the real entries
    kv = np.asarray(ref[1])
    np.testing.assert_array_equal(np.asarray(ref[0])[kv], np.asarray(fast[0])[kv])
