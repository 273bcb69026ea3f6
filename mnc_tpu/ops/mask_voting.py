"""Mask voting ("mask merge") — ≙ reference ``lib/nms/mv.pyx`` + ``gpu_mv.cu``.

Test-time post-process (TesterWrapper, SURVEY.md §3.3): for each NMS-kept
detection, average the soft masks of ALL candidate detections whose box IoU
with it is ≥ MASK_MERGE_IOU_THRESH, weighted by candidate score, with each
candidate mask resampled from its own box frame into the kept box's frame.
The reference ran this as a Cython/CUDA kernel on the host side of the
pipeline; here it is a fixed-shape on-device computation inside the same
jitted program as the rest of the cascade.

Memory layout note (TPU): a naive (kept × candidate) pairwise formulation
materializes (N, K, M, M) hat-matrix temporaries whose tiny trailing dims
(M=21) tile-pad ~7× — multi-GB at batch scale.  Instead the candidate axis is
processed in chunks under ``lax.scan``, accumulating the weighted resample
into a single (N, M, M) buffer; peak temp memory is O(N · chunk · M²).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mnc_tpu.ops.bbox import bbox_overlaps
from mnc_tpu.ops.roi_warp import interp_matrix


def _frame_coords(dst_box, src_box, m: int):
    """(M,) coords of dst-frame bin centers in the src mask's pixel space."""

    def axis(axis_id):
        lo_d = dst_box[1] if axis_id == 0 else dst_box[0]
        hi_d = dst_box[3] if axis_id == 0 else dst_box[2]
        lo_s = src_box[1] if axis_id == 0 else src_box[0]
        hi_s = src_box[3] if axis_id == 0 else src_box[2]
        span_d = hi_d - lo_d + 1.0
        span_s = jnp.maximum(hi_s - lo_s + 1.0, 1.0)
        grid = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
        img = lo_d + grid * span_d
        return (img - lo_s) / span_s * m - 0.5

    return axis(0), axis(1)


def _resample_to_frame(mask: jnp.ndarray, src_box: jnp.ndarray, dst_box: jnp.ndarray):
    """Resample (M, M) mask living in src_box's frame onto dst_box's grid."""
    m = mask.shape[-1]
    cy, cx = _frame_coords(dst_box, src_box, m)
    wy = interp_matrix(cy[None], m)[0]  # (M, M)
    wx = interp_matrix(cx[None], m)[0]
    return jnp.einsum("ps,st,qt->pq", wy, mask.astype(jnp.float32), wx,
                      precision="highest")


def _frame_coords_batched(dst_boxes: jnp.ndarray, src_boxes: jnp.ndarray, m: int):
    """Batched :func:`_frame_coords`: dst (..., 4) × src (..., 4) →
    (cy, cx) each (..., M), broadcasting leading dims."""
    grid = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m

    def axis(lo_d, hi_d, lo_s, hi_s):
        span_d = hi_d - lo_d + 1.0
        span_s = jnp.maximum(hi_s - lo_s + 1.0, 1.0)
        img = lo_d[..., None] + grid * span_d[..., None]
        return (img - lo_s[..., None]) / span_s[..., None] * m - 0.5

    cy = axis(dst_boxes[..., 1], dst_boxes[..., 3],
              src_boxes[..., 1], src_boxes[..., 3])
    cx = axis(dst_boxes[..., 0], dst_boxes[..., 2],
              src_boxes[..., 0], src_boxes[..., 2])
    return cy, cx


def _lerp_taps(coords: jnp.ndarray, size: int):
    """2-tap hat sampling: ((idx_lo, w_lo), (idx_hi, w_hi)) for coords (...).

    A hat-matrix row (:func:`interp_matrix`) has at most two nonzeros — the
    floor/ceil taps with weights (1-f, f) — and vanishes for taps outside
    [0, size).  Identical math to the matrix, without building it.
    """
    lo = jnp.floor(coords)
    f = coords - lo
    lo_i = lo.astype(jnp.int32)
    w_lo = jnp.where((lo_i >= 0) & (lo_i < size), 1.0 - f, 0.0)
    w_hi = jnp.where((lo_i + 1 >= 0) & (lo_i + 1 < size), f, 0.0)
    return ((jnp.clip(lo_i, 0, size - 1), w_lo),
            (jnp.clip(lo_i + 1, 0, size - 1), w_hi))


def _resample_gather(masks: jnp.ndarray, cy: jnp.ndarray, cx: jnp.ndarray):
    """Separable 2-tap resample: masks (..., S, S) sampled at cy/cx (..., M)
    → (..., M, M).  Equals the hat-matrix einsum to f32 rounding (~1e-7)
    with O(M·S) work instead of O(M·S²) matmuls.

    MEASURED 30× SLOWER than the einsum on TPU v5e (18.9 vs 0.62 ms/img at
    the production voting shape — docs/results/paste_kernel_r4.jsonl):
    ``take_along_axis`` lowers to serial dynamic gathers on TPU, so the
    FLOP saving never materializes.  Kept as (a) the fast path on gather-
    friendly backends and (b) an independently-formulated exactness oracle
    for the hat-matrix semantics (tests/test_masks.py).
    """
    s = masks.shape[-1]
    vals = masks.astype(jnp.float32)
    (yl, wyl), (yh, wyh) = _lerp_taps(cy, s)
    rows = (jnp.take_along_axis(vals, yl[..., None], axis=-2) * wyl[..., None]
            + jnp.take_along_axis(vals, yh[..., None], axis=-2) * wyh[..., None])
    (xl, wxl), (xh, wxh) = _lerp_taps(cx, s)
    return (jnp.take_along_axis(rows, xl[..., None, :], axis=-1) * wxl[..., None, :]
            + jnp.take_along_axis(rows, xh[..., None, :], axis=-1) * wxh[..., None, :])


def mask_voting(
    kept_boxes: jnp.ndarray,
    cand_boxes: jnp.ndarray,
    cand_scores: jnp.ndarray,
    cand_masks: jnp.ndarray,
    cand_valid: jnp.ndarray,
    iou_thresh: float = 0.5,
    chunk: int = 32,
) -> jnp.ndarray:
    """Score-weighted mask averaging over IoU-neighbors.

    Args:
      kept_boxes: (N, 4) NMS survivors (image coords).
      cand_boxes: (K, 4) all candidates of the same class.
      cand_scores: (K,).
      cand_masks: (K, M, M) soft masks in their own box frames.
      cand_valid: (K,) bool padding mask.
      iou_thresh: neighbor threshold (reference MASK_MERGE_IOU_THRESH=0.5).
      chunk: candidates processed per scan step (memory/latency knob).

    Returns (N, M, M) float32 merged soft masks in the kept boxes' frames.
    """
    n = kept_boxes.shape[0]
    k = cand_boxes.shape[0]
    m = cand_masks.shape[-1]

    iou = bbox_overlaps(kept_boxes, cand_boxes)  # (N, K)
    w = jnp.where((iou >= iou_thresh) & cand_valid[None, :],
                  cand_scores.astype(jnp.float32), 0.0)

    # pad K to a multiple of chunk (zero weight ⇒ no contribution)
    pad = (-k) % chunk
    if pad:
        cand_boxes = jnp.concatenate(
            [cand_boxes, jnp.ones((pad, 4), cand_boxes.dtype)], axis=0)
        cand_masks = jnp.concatenate(
            [cand_masks, jnp.zeros((pad, m, m), cand_masks.dtype)], axis=0)
        w = jnp.concatenate([w, jnp.zeros((n, pad), w.dtype)], axis=1)
    steps = (k + pad) // chunk

    boxes_c = cand_boxes.reshape(steps, chunk, 4)
    masks_c = cand_masks.reshape(steps, chunk, m, m)
    w_c = jnp.moveaxis(w.reshape(n, steps, chunk), 1, 0)  # (steps, N, chunk)

    resample_pair = jax.vmap(_resample_to_frame, in_axes=(0, 0, None))  # over chunk
    resample_all = jax.vmap(resample_pair, in_axes=(None, None, 0))  # over kept

    def body(acc, inp):
        bc, mc, wc = inp
        r = resample_all(mc, bc, kept_boxes)  # (N, chunk, M, M)
        acc = acc + jnp.einsum("nc,ncpq->npq", wc, r, precision="highest")
        return acc, None

    acc0 = jnp.zeros((n, m, m), jnp.float32)
    num, _ = jax.lax.scan(body, acc0, (boxes_c, masks_c, w_c))
    den = jnp.maximum(jnp.sum(w, axis=1), 1e-8)
    return num / den[:, None, None]


def box_voting(
    kept_boxes: jnp.ndarray,
    cand_boxes: jnp.ndarray,
    cand_scores: jnp.ndarray,
    cand_valid: jnp.ndarray | None = None,
    iou_thresh: float = 0.5,
) -> jnp.ndarray:
    """Score-weighted box averaging over IoU neighbors.

    The box-averaging half of the reference mask-merge op (``lib/nms/mv.pyx``,
    SURVEY §2.1 — flagged ⚠detail there; resolved per VERDICT r3 item 4 as a
    gated option, ``TEST.VOTE_BOXES``, default off = mask-only voting).  Each
    kept box becomes the candidate-score-weighted mean of all candidate boxes
    with IoU >= ``iou_thresh`` against the ORIGINAL kept box; a box with no
    neighbors (cannot happen when it is its own candidate) stays unchanged.

    Args:
      kept_boxes: (N, 4) NMS survivors.
      cand_boxes: (K, 4) same-class candidates.
      cand_scores: (K,).
      cand_valid: (K,) bool padding mask (None = all valid).

    Returns (N, 4) float32 averaged boxes.
    """
    iou = bbox_overlaps(kept_boxes, cand_boxes)  # (N, K)
    w = jnp.where(iou >= iou_thresh, cand_scores.astype(jnp.float32), 0.0)
    if cand_valid is not None:
        w = jnp.where(cand_valid[None, :], w, 0.0)
    den = jnp.sum(w, axis=1)
    num = w @ cand_boxes.astype(jnp.float32)  # (N, 4)
    return jnp.where(den[:, None] > 1e-8, num / jnp.maximum(den, 1e-8)[:, None],
                     kept_boxes.astype(jnp.float32))


def box_voting_per_det(
    kept_boxes: jnp.ndarray,
    cand_boxes: jnp.ndarray,
    cand_scores: jnp.ndarray,
    iou_thresh: float = 0.5,
) -> jnp.ndarray:
    """:func:`box_voting` with a PER-DETECTION candidate set.

    Args: kept_boxes (N, 4); cand_boxes (N, Cv, 4); cand_scores (N, Cv).
    Returns (N, 4) score-weighted neighbor-average boxes (a kept box is
    always its own candidate post-NMS, so the denominator never vanishes;
    guarded anyway).
    """
    iou = jax.vmap(lambda kb, cb: bbox_overlaps(kb[None], cb)[0])(
        kept_boxes, cand_boxes)  # (N, Cv)
    w = jnp.where(iou >= iou_thresh, cand_scores.astype(jnp.float32), 0.0)
    den = jnp.sum(w, axis=1)
    num = jnp.einsum("nc,ncd->nd", w, cand_boxes.astype(jnp.float32))
    return jnp.where(den[:, None] > 1e-8, num / jnp.maximum(den, 1e-8)[:, None],
                     kept_boxes.astype(jnp.float32))


def mask_voting_per_det(
    kept_boxes: jnp.ndarray,
    cand_boxes: jnp.ndarray,
    cand_scores: jnp.ndarray,
    cand_masks: jnp.ndarray,
    iou_thresh: float = 0.5,
    impl: str = "einsum",
) -> jnp.ndarray:
    """Voting with a PER-DETECTION candidate set (the post-top-K fast path).

    Used after the cross-class top-K cut: each surviving detection brings its
    own (pre-pruned, class-specific) candidate pool, so only final survivors
    pay for resampling.

    Args:
      kept_boxes: (N, 4).
      cand_boxes: (N, Cv, 4) candidates per kept det.
      cand_scores: (N, Cv) — zero entries are ignored.
      cand_masks: (N, Cv, M, M).
      iou_thresh: neighbor threshold.
      impl: "einsum" (per-pair hat matmuls) or "gather" (separable 2-tap
        take_along_axis — same math to f32 rounding, O(M·S) per pair).

    Returns (N, M, M) merged soft masks.
    """
    iou = jax.vmap(lambda kb, cb: bbox_overlaps(kb[None], cb)[0])(
        kept_boxes, cand_boxes)  # (N, Cv)
    w = jnp.where(iou >= iou_thresh, cand_scores.astype(jnp.float32), 0.0)

    if impl == "gather":
        m = cand_masks.shape[-1]
        cy, cx = _frame_coords_batched(
            kept_boxes[:, None, :], cand_boxes, m)  # (N, Cv, M)
        stacks = _resample_gather(cand_masks, cy, cx)  # (N, Cv, M, M)
    else:
        resample = jax.vmap(  # over kept dets
            jax.vmap(_resample_to_frame, in_axes=(0, 0, None)),  # over candidates
            in_axes=(0, 0, 0))
        stacks = resample(cand_masks, cand_boxes, kept_boxes)  # (N, Cv, M, M)
    num = jnp.einsum("nc,ncpq->npq", w, stacks, precision="highest")
    den = jnp.maximum(jnp.sum(w, axis=1), 1e-8)
    return num / den[:, None, None]
