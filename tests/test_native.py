"""Native C++ helpers vs numpy/jax oracles."""

import numpy as np
import pytest

from mnc_tpu import native
from tests.conftest import random_boxes


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.available(), "native lib must build in this environment"


def test_native_bbox_overlaps(rng):
    boxes = random_boxes(rng, 17)
    query = random_boxes(rng, 11)
    from mnc_tpu.ops.bbox import bbox_overlaps as jx

    np.testing.assert_allclose(
        native.bbox_overlaps(boxes, query), np.asarray(jx(boxes, query)),
        rtol=1e-5, atol=1e-6)


def test_native_cpu_nms_matches_device_nms(rng):
    from mnc_tpu.ops.nms import nms_fixed

    boxes = random_boxes(rng, 100)
    scores = rng.uniform(size=100).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sb = boxes[order]
    keep_native = native.cpu_nms(sb, 0.5)
    keep_dev = np.asarray(nms_fixed(sb, np.ones(100, bool), 0.5))
    np.testing.assert_array_equal(keep_native, keep_dev)


def test_native_mask_iou(rng):
    a = (rng.uniform(size=(6, 33, 47)) > 0.6).astype(np.uint8)
    b = (rng.uniform(size=(4, 33, 47)) > 0.6).astype(np.uint8)
    got = native.mask_iou_matrix(a, b)
    inter = (a[:, None] & b[None]).sum((-2, -1)).astype(np.float32)
    union = (a[:, None] | b[None]).sum((-2, -1)).astype(np.float32)
    np.testing.assert_allclose(got, inter / np.maximum(union, 1), rtol=1e-6)


def test_native_rle_roundtrip(rng):
    mask = (rng.uniform(size=(37, 53)) > 0.7).astype(np.uint8)
    rle = native.rle_encode(mask)
    back = native.rle_decode(rle)
    np.testing.assert_array_equal(back, mask)
    # runs sum to the pixel count
    assert int(np.sum(rle["counts"])) == mask.size


def test_native_rle_empty_and_full():
    for mask in (np.zeros((9, 9), np.uint8), np.ones((9, 9), np.uint8)):
        np.testing.assert_array_equal(native.rle_decode(native.rle_encode(mask)), mask)


def test_native_mask_voting_matches_device(rng):
    from mnc_tpu.ops.mask_voting import mask_voting

    m = 13
    kept = random_boxes(rng, 3, h=100, w=100, min_size=20)
    cand = np.concatenate([kept + rng.uniform(-3, 3, size=kept.shape).astype(np.float32),
                           random_boxes(rng, 4, h=100, w=100)])
    scores = rng.uniform(0.1, 1.0, size=len(cand)).astype(np.float32)
    masks = rng.uniform(size=(len(cand), m, m)).astype(np.float32)
    got = native.mask_voting_cpu(kept, cand, scores, masks, 0.5)
    want = np.asarray(mask_voting(kept, cand, scores, masks,
                                  np.ones(len(cand), bool), 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
