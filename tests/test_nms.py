"""Fixed-shape on-device NMS vs the classic greedy oracle.

The oracle below is the reference ``lib/nms/cpu_nms.pyx`` algorithm in numpy;
nms_fixed must make identical selections (SURVEY.md §4 "NMS vs numpy oracle").
"""

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
