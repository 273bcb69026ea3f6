"""Mask voting ("mask merge") — ≙ reference ``lib/nms/mv.pyx`` + ``gpu_mv.cu``.

Test-time post-process (TesterWrapper, SURVEY.md §3.3): for each NMS-kept
detection, average the soft masks of ALL candidate detections whose box IoU
with it is ≥ MASK_MERGE_IOU_THRESH, weighted by candidate score, with each
candidate mask resampled from its own box frame into the kept box's frame.
The reference ran this as a Cython/CUDA kernel on the host side of the
pipeline; here it is a fixed-shape on-device computation (hat-matrix bilinear
resampling per (kept, candidate) pair → two small matmuls) inside the same
jitted program as the rest of the cascade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mnc_tpu.ops.bbox import bbox_overlaps
from mnc_tpu.ops.roi_warp import interp_matrix


def _resample_to_frame(mask: jnp.ndarray, src_box: jnp.ndarray, dst_box: jnp.ndarray):
    """Resample (M, M) mask living in src_box's frame onto dst_box's grid."""
    m = mask.shape[-1]

    def coords(axis):
        lo_d = dst_box[1] if axis == 0 else dst_box[0]
        hi_d = dst_box[3] if axis == 0 else dst_box[2]
        lo_s = src_box[1] if axis == 0 else src_box[0]
        hi_s = src_box[3] if axis == 0 else src_box[2]
        span_d = hi_d - lo_d + 1.0
        span_s = jnp.maximum(hi_s - lo_s + 1.0, 1.0)
        grid = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m  # dst bin centers
        img = lo_d + grid * span_d  # image coords
        return (img - lo_s) / span_s * m - 0.5  # src mask coords

    wy = interp_matrix(coords(0)[None], m)[0]  # (M, M)
    wx = interp_matrix(coords(1)[None], m)[0]
    return jnp.einsum("ps,st,qt->pq", wy, mask.astype(jnp.float32), wx, precision="highest")


def mask_voting(
    kept_boxes: jnp.ndarray,
    cand_boxes: jnp.ndarray,
    cand_scores: jnp.ndarray,
    cand_masks: jnp.ndarray,
    cand_valid: jnp.ndarray,
    iou_thresh: float = 0.5,
) -> jnp.ndarray:
    """Score-weighted mask averaging over IoU-neighbors.

    Args:
      kept_boxes: (N, 4) NMS survivors (image coords).
      cand_boxes: (K, 4) all candidates of the same class.
      cand_scores: (K,).
      cand_masks: (K, M, M) soft masks in their own box frames.
      cand_valid: (K,) bool padding mask.
      iou_thresh: neighbor threshold (reference MASK_MERGE_IOU_THRESH=0.5).

    Returns (N, M, M) float32 merged soft masks in the kept boxes' frames.
    """
    iou = bbox_overlaps(kept_boxes, cand_boxes)  # (N, K)
    w = jnp.where((iou >= iou_thresh) & cand_valid[None, :], cand_scores[None, :], 0.0)

    resample_j = jax.vmap(_resample_to_frame, in_axes=(0, 0, None))  # over candidates
    resample_ij = jax.vmap(resample_j, in_axes=(None, None, 0))  # over kept

    stacks = resample_ij(cand_masks, cand_boxes, kept_boxes)  # (N, K, M, M)
    num = jnp.einsum("nk,nkpq->npq", w, stacks, precision="highest")
    den = jnp.maximum(jnp.sum(w, axis=1), 1e-8)
    return num / den[:, None, None]
