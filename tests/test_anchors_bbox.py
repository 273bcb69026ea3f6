"""Anchors + box geometry vs hand-derived / numpy oracles."""

import numpy as np

from mnc_tpu.ops.anchors import generate_anchors, shifted_anchors
from mnc_tpu.ops.bbox import bbox_overlaps, bbox_transform, bbox_transform_inv, clip_boxes
from tests.conftest import random_boxes

# The canonical 9 stride-16 anchors of the reference generate_anchors
# (3 ratios x 3 scales, Caffe +1 widths, banker's rounding).
CANONICAL = np.array(
    [
        [-84, -40, 99, 55],
        [-176, -88, 191, 103],
        [-360, -184, 375, 199],
        [-56, -56, 71, 71],
        [-120, -120, 135, 135],
        [-248, -248, 263, 263],
        [-36, -80, 51, 95],
        [-80, -168, 95, 183],
        [-168, -344, 183, 359],
    ],
    dtype=np.float32,
)


def test_generate_anchors_canonical():
    np.testing.assert_array_equal(generate_anchors(), CANONICAL)


def test_shifted_anchors_layout():
    a = shifted_anchors(2, 3, stride=16)
    assert a.shape == (2 * 3 * 9, 4)
    # First 9 rows are the base anchors at shift (0, 0).
    np.testing.assert_array_equal(a[:9], CANONICAL)
    # Next 9 are shifted one cell right (+16 in x).
    np.testing.assert_array_equal(a[9:18], CANONICAL + np.array([16, 0, 16, 0], np.float32))
    # Row-major: position (y=1, x=0) starts at index 3*9.
    np.testing.assert_array_equal(a[27:36], CANONICAL + np.array([0, 16, 0, 16], np.float32))


def _np_overlaps(boxes, query):
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k), dtype=np.float64)
    for i in range(n):
        for j in range(k):
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + 1
            ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + 1
            if iw > 0 and ih > 0:
                ua = (
                    (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
                    + (query[j, 2] - query[j, 0] + 1) * (query[j, 3] - query[j, 1] + 1)
                    - iw * ih
                )
                out[i, j] = iw * ih / ua
    return out


def test_bbox_overlaps_oracle(rng):
    boxes = random_boxes(rng, 23)
    query = random_boxes(rng, 17)
    got = np.asarray(bbox_overlaps(boxes, query))
    np.testing.assert_allclose(got, _np_overlaps(boxes, query), rtol=1e-5, atol=1e-6)


def test_bbox_transform_roundtrip(rng):
    ex = random_boxes(rng, 40)
    gt = random_boxes(rng, 40)
    deltas = bbox_transform(ex, gt)
    back = np.asarray(bbox_transform_inv(ex, deltas))
    np.testing.assert_allclose(back, gt, rtol=1e-4, atol=1e-3)


def test_clip_boxes():
    b = np.array([[-5.0, -3.0, 400.0, 250.0], [10.0, 20.0, 30.0, 40.0]], np.float32)
    c = np.asarray(clip_boxes(b, (200.0, 300.0)))
    np.testing.assert_array_equal(c[0], [0.0, 0.0, 299.0, 199.0])
    np.testing.assert_array_equal(c[1], b[1])
