"""Box geometry — jit-friendly ports of the reference box math.

Behavioral port of ``lib/transform/bbox_transform.py`` (bbox_transform,
bbox_transform_inv, clip_boxes) and ``lib/utils/cython_bbox.pyx``
(bbox_overlaps), preserving the Caffe pixel convention (w = x2 - x1 + 1).

All functions are pure jnp, fixed-shape, batched, and differentiable where it
matters (bbox_transform_inv feeds the cascade's stage bridge, through which
box gradients flow into earlier stages).
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Regression targets (dx, dy, dw, dh) that map ex_rois onto gt_rois.

    Shapes: (..., 4) -> (..., 4).
    """
    ex_w = ex_rois[..., 2] - ex_rois[..., 0] + 1.0
    ex_h = ex_rois[..., 3] - ex_rois[..., 1] + 1.0
    ex_cx = ex_rois[..., 0] + 0.5 * ex_w
    ex_cy = ex_rois[..., 1] + 0.5 * ex_h

    gt_w = gt_rois[..., 2] - gt_rois[..., 0] + 1.0
    gt_h = gt_rois[..., 3] - gt_rois[..., 1] + 1.0
    gt_cx = gt_rois[..., 0] + 0.5 * gt_w
    gt_cy = gt_rois[..., 1] + 0.5 * gt_h

    # Guard against degenerate (padded) boxes: clamp sizes to >= 1.
    ex_w = jnp.maximum(ex_w, 1.0)
    ex_h = jnp.maximum(ex_h, 1.0)
    gt_w = jnp.maximum(gt_w, 1.0)
    gt_h = jnp.maximum(gt_h, 1.0)

    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply regression deltas to boxes.  (..., 4), (..., 4) -> (..., 4).

    Differentiable w.r.t. both inputs — this is the stage-bridge op through
    which later-stage box gradients reach the RPN (reference
    ``lib/pylayer/stage_bridge_layer.py`` forward math).
    """
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    dx, dy, dw, dh = (deltas[..., i] for i in range(4))
    # Clamp dw/dh as in modern detectron-style impls to avoid exp overflow on
    # padded garbage (reference relied on host float64 and no padding).
    dw = jnp.clip(dw, -8.0, 8.0)
    dh = jnp.clip(dh, -8.0, 8.0)

    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h

    return jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w - 1.0,
            pred_cy + 0.5 * pred_h - 1.0,
        ],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, im_hw) -> jnp.ndarray:
    """Clip boxes to the image: x in [0, W-1], y in [0, H-1].

    ``im_hw`` is (h, w) — scalars or traced values (from im_info).
    """
    h, w = im_hw
    x1 = jnp.clip(boxes[..., 0], 0.0, w - 1.0)
    y1 = jnp.clip(boxes[..., 1], 0.0, h - 1.0)
    x2 = jnp.clip(boxes[..., 2], 0.0, w - 1.0)
    y2 = jnp.clip(boxes[..., 3], 0.0, h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0] + 1.0) * (boxes[..., 3] - boxes[..., 1] + 1.0)


def bbox_overlaps(boxes: jnp.ndarray, query_boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix (N, K) between boxes (N, 4) and query_boxes (K, 4).

    Port of ``lib/utils/cython_bbox.pyx::bbox_overlaps`` (+1 widths).
    """
    b = boxes[:, None, :]  # (N, 1, 4)
    q = query_boxes[None, :, :]  # (1, K, 4)
    iw = jnp.minimum(b[..., 2], q[..., 2]) - jnp.maximum(b[..., 0], q[..., 0]) + 1.0
    ih = jnp.minimum(b[..., 3], q[..., 3]) - jnp.maximum(b[..., 1], q[..., 1]) + 1.0
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    union = bbox_area(boxes)[:, None] + bbox_area(query_boxes)[None, :] - inter
    return inter / jnp.maximum(union, 1.0)
