"""NMS dispatch — ≙ reference ``lib/nms/nms_wrapper.py``.

The reference chose between ``cpu_nms`` and ``gpu_nms`` via
``cfg.USE_GPU_NMS``; here the on-device (XLA) implementation is the default
inside jitted pipelines, and the native C++ one serves host-side code.  This
module keeps the reference's host-facing API: ``nms(dets, thresh)`` over
(N, 5) [x1, y1, x2, y2, score] arrays, returning kept indices.
"""

from __future__ import annotations

import numpy as np


def nms(dets: np.ndarray, thresh: float, force_cpu: bool = False) -> np.ndarray:
    """Greedy NMS over (N, 5) dets; returns kept indices in score order."""
    if len(dets) == 0:
        return np.zeros((0,), np.int64)
    boxes = np.ascontiguousarray(dets[:, :4], np.float32)
    scores = np.asarray(dets[:, 4], np.float32)
    order = np.argsort(-scores, kind="stable")
    from mnc_tpu import native

    keep_mask = native.cpu_nms(boxes[order], float(thresh))
    return order[keep_mask]


def apply_nms(all_boxes: list, thresh: float) -> list:
    """Per-class, per-image NMS over the reference's all_boxes structure
    (all_boxes[cls][img] = (N, 5) array)."""
    out = [[[] for _ in range(len(cls_boxes))] for cls_boxes in all_boxes]
    for c, cls_boxes in enumerate(all_boxes):
        for i, dets in enumerate(cls_boxes):
            dets = np.asarray(dets)
            if dets.size == 0:
                continue
            out[c][i] = dets[nms(dets, thresh)]
    return out
