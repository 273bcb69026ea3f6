"""On-device training target assignment.

Fixed-shape, masked re-designs of the reference's dynamic-shape Python layers:

- :func:`anchor_targets` ≙ ``lib/pylayer/anchor_target_layer.py`` — RPN
  labels/regression targets over all anchors with random fg/bg subsampling.
- :func:`proposal_targets` ≙ ``lib/pylayer/proposal_target_layer.py`` — sample
  a fixed RoI batch (fg quota + bg fill), assign class labels, normalized
  bbox deltas and MASK_SIZE² mask targets.
- :func:`reassign_targets` ≙ the target-recomputation half of
  ``lib/pylayer/stage_bridge_layer.py`` — after the 5-stage bridge refines the
  sampled RoIs, labels/box/mask targets are recomputed for the second pass
  (no re-sampling).

The reference did all of this per-iteration in numpy on the host (forcing a
GPU→host→GPU round trip inside every training step); here each is pure jnp
under jit.  Random subsampling uses rank-of-random-key selection: give every
eligible item a uniform key, rank them, keep ranks below the (traced) quota —
same marginal distribution as ``npr.choice(..., replace=False)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mnc_tpu.ops.bbox import bbox_overlaps, bbox_transform
from mnc_tpu.ops.masks import intersect_mask


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray  # (K,) int32 ∈ {-1 ignore, 0 bg, 1 fg}
    bbox_targets: jnp.ndarray  # (K, 4)
    bbox_inside_w: jnp.ndarray  # (K, 4)
    bbox_outside_w: jnp.ndarray  # (K, 4)


class RoiTargets(NamedTuple):
    rois: jnp.ndarray  # (B, 4) sampled boxes
    labels: jnp.ndarray  # (B,) int32 ∈ {-1 pad, 0 bg, 1..C-1 fg class}
    bbox_targets: jnp.ndarray  # (B, 4) normalized deltas to matched gt
    bbox_weight: jnp.ndarray  # (B,) 1.0 for fg
    mask_targets: jnp.ndarray  # (B, M, M) binary
    mask_weight: jnp.ndarray  # (B,) 1.0 for fg


def _random_keep(key, eligible: jnp.ndarray, quota, max_quota: int) -> jnp.ndarray:
    """``eligible & (rank-in-random-permutation(eligible) < quota)``.

    Selection identical to ranking a full argsort of uniform keys (ties
    break to the lower index in both ``jnp.argsort`` and ``lax.top_k``) but
    via a top-k of the static bound ``max_quota`` — a full (K,) sort over
    the ~23k-anchor grid was ~0.4 ms/img of the reference-budget train
    step for a ≤256-element selection.  ``quota`` may be traced;
    ``max_quota`` is its static upper bound.
    """
    r = jax.random.uniform(key, eligible.shape)
    r = jnp.where(eligible, r, 2.0)  # push ineligible to the back
    k = min(int(max_quota), r.shape[0])
    _, idx = jax.lax.top_k(-r, k)  # k smallest r, rank order
    keep = jnp.zeros(r.shape, bool).at[idx].set(jnp.arange(k) < quota)
    return keep & eligible


def anchor_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    im_hw,
    key: jax.Array,
    pos_overlap: float = 0.7,
    neg_overlap: float = 0.3,
    batch_size: int = 256,
    fg_fraction: float = 0.5,
    clobber_positives: bool = False,
    positive_weight: float = -1.0,
    inside_weights=(1.0, 1.0, 1.0, 1.0),
) -> AnchorTargets:
    """RPN training targets over the full anchor grid (K anchors).

    Reference semantics preserved: only anchors fully inside the (scaled)
    image participate; positives are (a) per-gt argmax anchors and (b) anchors
    with IoU ≥ pos_overlap; negatives have max-IoU < neg_overlap; both sides
    randomly subsampled to a 256-anchor batch with ≤ 50% positives; SmoothL1
    outside-weights encode uniform 1/N_batch normalization.
    """
    k = anchors.shape[0]
    h, w = im_hw
    inside = (
        (anchors[:, 0] >= 0)
        & (anchors[:, 1] >= 0)
        & (anchors[:, 2] < w)
        & (anchors[:, 3] < h)
    )

    overlaps = bbox_overlaps(anchors, gt_boxes)  # (K, G)
    overlaps = jnp.where(gt_valid[None, :], overlaps, 0.0)
    overlaps = jnp.where(inside[:, None], overlaps, 0.0)
    max_ov = jnp.max(overlaps, axis=1)
    argmax_gt = jnp.argmax(overlaps, axis=1)

    # per-gt argmax anchors (all ties), as in the reference
    gt_max = jnp.max(overlaps, axis=0)  # (G,)
    is_gt_argmax = jnp.any(
        (overlaps == gt_max[None, :]) & (gt_max[None, :] > 0) & gt_valid[None, :], axis=1
    )

    pos = inside & (is_gt_argmax | (max_ov >= pos_overlap))
    neg = inside & (max_ov < neg_overlap)
    if clobber_positives:
        pos = pos & ~neg
    else:
        neg = neg & ~pos

    k_pos, k_neg = jax.random.split(key)
    num_fg = int(batch_size * fg_fraction)
    pos_keep = _random_keep(k_pos, pos, num_fg, num_fg)
    n_pos = jnp.sum(pos_keep)
    neg_keep = _random_keep(k_neg, neg, batch_size - n_pos, batch_size)
    n_tot = n_pos + jnp.sum(neg_keep)

    labels = jnp.where(pos_keep, 1, jnp.where(neg_keep, 0, -1)).astype(jnp.int32)

    matched_gt = gt_boxes[argmax_gt]
    bbox_targets = bbox_transform(anchors, matched_gt)
    bbox_targets = jnp.where(pos_keep[:, None], bbox_targets, 0.0)
    inside_w = jnp.where(pos_keep[:, None], jnp.asarray(inside_weights), 0.0)
    if positive_weight > 0:
        # RPN_POSITIVE_WEIGHT p ∈ (0, 1): positives share p, negatives 1-p
        wp = positive_weight / jnp.maximum(n_pos.astype(jnp.float32), 1.0)
        wn = (1.0 - positive_weight) / jnp.maximum(
            jnp.sum(neg_keep).astype(jnp.float32), 1.0)
        outside_w = (jnp.where(pos_keep[:, None], wp, 0.0)
                     + jnp.where(neg_keep[:, None], wn, 0.0)) * jnp.ones((k, 4))
    else:
        # default −1: uniform 1/N_batch over all sampled anchors
        uniform = 1.0 / jnp.maximum(n_tot.astype(jnp.float32), 1.0)
        outside_w = jnp.where((pos_keep | neg_keep)[:, None], uniform, 0.0) \
            * jnp.ones((k, 4))
    return AnchorTargets(labels, bbox_targets, inside_w, outside_w)


def _assign(
    rois, gt_boxes, gt_classes, gt_valid, fg_thresh
):
    """Match rois to gt: (max_overlap, matched box, matched class, fg mask)."""
    overlaps = bbox_overlaps(rois, gt_boxes)
    overlaps = jnp.where(gt_valid[None, :], overlaps, 0.0)
    max_ov = jnp.max(overlaps, axis=1)
    arg = jnp.argmax(overlaps, axis=1)
    return max_ov, arg, gt_boxes[arg], gt_classes[arg], max_ov >= fg_thresh


def _assign_mask_iou(rois, roi_masks, gt_boxes, gt_classes, gt_valid,
                     gt_masks, fg_thresh):
    """_assign by MASK IoU (TRAIN.CFM_IOU="mask"): each proposal carries
    its own mask in its box frame (the CFM segment pool); IoU vs each gt
    instance is computed in image pixels — areas as binary-mask fraction ×
    box area (+1-width convention), intersection by resampling the gt mask
    into the proposal's box frame (ops/masks.py::intersect_mask)."""
    from mnc_tpu.ops.masks import intersect_mask

    s = roi_masks.shape[-1]
    n = rois.shape[0]

    def area(boxes):
        return ((boxes[:, 2] - boxes[:, 0] + 1.0)
                * (boxes[:, 3] - boxes[:, 1] + 1.0))

    rbin = roi_masks > 0.5
    roi_px = jnp.mean(rbin, axis=(-2, -1)) * area(rois)  # (N,)
    gt_px = (jnp.mean(gt_masks > 0.5, axis=(-2, -1)) * area(gt_boxes))

    def per_gt(gt_box, gt_mask):
        proj = intersect_mask(rois, jnp.broadcast_to(gt_box, (n, 4)),
                              jnp.broadcast_to(gt_mask, (n, *gt_mask.shape)),
                              s)  # (N, s, s) gt content in each roi frame
        inter = jnp.mean(rbin & (proj > 0.5), axis=(-2, -1)) * area(rois)
        return inter

    inter = jax.vmap(per_gt)(gt_boxes, gt_masks).T  # (N, G)
    union = roi_px[:, None] + gt_px[None, :] - inter
    overlaps = inter / jnp.maximum(union, 1.0)
    overlaps = jnp.where(gt_valid[None, :], overlaps, 0.0)
    max_ov = jnp.max(overlaps, axis=1)
    arg = jnp.argmax(overlaps, axis=1)
    return max_ov, arg, gt_boxes[arg], gt_classes[arg], max_ov >= fg_thresh


def proposal_targets(
    rois: jnp.ndarray,
    roi_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    gt_masks: jnp.ndarray,
    key: jax.Array,
    roi_batch: int = 128,
    fg_fraction: float = 0.25,
    fg_thresh: float = 0.5,
    bg_thresh_hi: float = 0.5,
    bg_thresh_lo: float = 0.0,
    mask_size: int = 21,
    bbox_means=(0.0, 0.0, 0.0, 0.0),
    bbox_stds=(0.1, 0.1, 0.2, 0.2),
) -> RoiTargets:
    """Sample a fixed (roi_batch,) RoI training batch with full targets.

    As in the reference, the gt boxes themselves are appended to the proposal
    set before sampling (guaranteeing clean positives early in training).
    Padding slots (when fewer than roi_batch eligible RoIs exist) carry
    label -1 and zero weights.
    """
    all_rois = jnp.concatenate([rois, gt_boxes], axis=0)
    all_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)
    if all_rois.shape[0] < roi_batch:  # tiny configs: pad the pool itself
        pad = roi_batch - all_rois.shape[0]
        all_rois = jnp.concatenate([all_rois, jnp.zeros((pad, 4))], axis=0)
        all_valid = jnp.concatenate([all_valid, jnp.zeros((pad,), bool)], axis=0)

    max_ov, arg, mboxes, mcls, fg = _assign(all_rois, gt_boxes, gt_classes, gt_valid,
                                            fg_thresh)
    fg = fg & all_valid
    bg = all_valid & (max_ov < bg_thresh_hi) & (max_ov >= bg_thresh_lo) & ~fg

    k_fg, k_bg = jax.random.split(key)
    fg_quota = int(round(roi_batch * fg_fraction))
    fg_keep = _random_keep(k_fg, fg, fg_quota, fg_quota)
    n_fg = jnp.sum(fg_keep)
    bg_keep = _random_keep(k_bg, bg, roi_batch - n_fg, roi_batch)

    # Gather the kept rois into a dense (roi_batch,) block: priority fg > bg.
    sel_key = jnp.where(fg_keep, 2.0, jnp.where(bg_keep, 1.0, 0.0))
    _, idx = jax.lax.top_k(sel_key, roi_batch)
    picked_fg = fg_keep[idx]
    picked_bg = bg_keep[idx]

    s_rois = all_rois[idx]
    labels = jnp.where(picked_fg, mcls[idx], jnp.where(picked_bg, 0, -1)).astype(jnp.int32)

    deltas = bbox_transform(s_rois, mboxes[idx])
    deltas = (deltas - jnp.asarray(bbox_means)) / jnp.asarray(bbox_stds)
    bbox_targets = jnp.where(picked_fg[:, None], deltas, 0.0)
    bbox_weight = picked_fg.astype(jnp.float32)

    m_targets = intersect_mask(s_rois, mboxes[idx], gt_masks[arg[idx]], mask_size)
    m_targets = jnp.where(picked_fg[:, None, None], m_targets, 0.0)
    return RoiTargets(s_rois, labels, bbox_targets, bbox_weight, m_targets, bbox_weight)


def reassign_targets(
    rois: jnp.ndarray,
    prev_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    gt_masks: jnp.ndarray,
    fg_thresh: float = 0.5,
    mask_size: int = 21,
    bbox_means=(0.0, 0.0, 0.0, 0.0),
    bbox_stds=(0.1, 0.1, 0.2, 0.2),
) -> RoiTargets:
    """Recompute targets for bridge-refined RoIs (stages 4-5); no re-sampling.

    RoIs that were padding (-1) stay padding; survivors are re-labeled fg/bg
    by their refined overlap, with fresh box/mask targets against the newly
    matched gt.
    """
    valid = prev_labels >= 0
    max_ov, arg, mboxes, mcls, fg = _assign(rois, gt_boxes, gt_classes, gt_valid,
                                            fg_thresh)
    fg = fg & valid
    labels = jnp.where(fg, mcls, jnp.where(valid, 0, -1)).astype(jnp.int32)

    deltas = bbox_transform(rois, mboxes)
    deltas = (deltas - jnp.asarray(bbox_means)) / jnp.asarray(bbox_stds)
    bbox_targets = jnp.where(fg[:, None], deltas, 0.0)
    w = fg.astype(jnp.float32)
    m_targets = intersect_mask(rois, mboxes, gt_masks[arg], mask_size)
    m_targets = jnp.where(fg[:, None, None], m_targets, 0.0)
    return RoiTargets(rois, labels, bbox_targets, w, m_targets, w)


class CfmTargets(NamedTuple):
    rois: jnp.ndarray  # (B, 4) sampled segment boxes
    labels: jnp.ndarray  # (B,) int32 ∈ {-1 pad, 0 bg, 1..C-1 fg class}
    bbox_targets: jnp.ndarray  # (B, 4) normalized deltas to matched gt
    bbox_weight: jnp.ndarray  # (B,) 1.0 for fg
    seg_masks: jnp.ndarray  # (B, S, S) each sample's OWN segment mask (input)


def cfm_targets(
    seg_boxes: jnp.ndarray,
    seg_masks: jnp.ndarray,
    seg_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    gt_masks: jnp.ndarray,
    key: jax.Array,
    roi_batch: int = 128,
    fg_fraction: float = 0.25,
    fg_thresh: float = 0.5,
    bg_thresh_hi: float = 0.5,
    bg_thresh_lo: float = 0.0,
    bbox_means=(0.0, 0.0, 0.0, 0.0),
    bbox_stds=(0.1, 0.1, 0.2, 0.2),
    iou_mode: str = "box",
) -> CfmTargets:
    """Training sample for the CFM path (SURVEY §3.5): label PRECOMPUTED
    segment proposals instead of RPN proposals.

    ≙ ProposalTargetLayer semantics (``lib/pylayer/proposal_target_layer.py``)
    applied to an MCG segment pool: gt instances are appended to the pool
    (each carrying its own full mask, resampled to the segment mask size),
    fg = box-IoU ≥ fg_thresh with class = matched gt's class, bg ∈
    [bg_thresh_lo, bg_thresh_hi), fixed fg quota + bg fill, NORMALIZED bbox
    regression deltas.  Unlike :func:`proposal_targets` there are no mask
    TARGETS — the segment's own mask rides along as the mask-pooling INPUT
    (``models/cfm.py``); the mask head is not trained in CFM mode.

    ⚠ The reference tree's exact CFM labeling rule (box IoU vs segment-mask
    IoU) is unverifiable here (empty mount); box IoU matches this repo's
    fixtured ProposalTargetLayer convention and the CFM paper's box-level
    sampling is the documented fallback.  ``iou_mode="mask"``
    (TRAIN.CFM_IOU) labels by segment-mask↔gt-mask IoU instead: the gt
    mask is resampled into each segment's box frame (intersect_mask) and
    IoU is computed in image pixels (areas = mask fraction × box area,
    +1-width convention) — flip the knob if the reference rule turns out
    to be mask-level.
    """
    s = seg_masks.shape[-1]
    # gt instances join the pool with their own full masks in gt-box frame
    gt_self_masks = intersect_mask(gt_boxes, gt_boxes, gt_masks, s)
    all_rois = jnp.concatenate([seg_boxes, gt_boxes], axis=0)
    all_masks = jnp.concatenate([seg_masks, gt_self_masks], axis=0)
    all_valid = jnp.concatenate([seg_valid, gt_valid], axis=0)
    if all_rois.shape[0] < roi_batch:  # tiny configs: pad the pool itself
        pad = roi_batch - all_rois.shape[0]
        all_rois = jnp.concatenate([all_rois, jnp.zeros((pad, 4))], axis=0)
        all_masks = jnp.concatenate([all_masks, jnp.zeros((pad, s, s))], axis=0)
        all_valid = jnp.concatenate([all_valid, jnp.zeros((pad,), bool)], axis=0)

    if iou_mode == "mask":
        max_ov, arg, mboxes, mcls, fg = _assign_mask_iou(
            all_rois, all_masks, gt_boxes, gt_classes, gt_valid, gt_masks,
            fg_thresh)
    else:
        max_ov, arg, mboxes, mcls, fg = _assign(all_rois, gt_boxes,
                                                gt_classes, gt_valid,
                                                fg_thresh)
    fg = fg & all_valid
    bg = all_valid & (max_ov < bg_thresh_hi) & (max_ov >= bg_thresh_lo) & ~fg

    k_fg, k_bg = jax.random.split(key)
    fg_quota = int(round(roi_batch * fg_fraction))
    fg_keep = _random_keep(k_fg, fg, fg_quota, fg_quota)
    n_fg = jnp.sum(fg_keep)
    bg_keep = _random_keep(k_bg, bg, roi_batch - n_fg, roi_batch)

    sel_key = jnp.where(fg_keep, 2.0, jnp.where(bg_keep, 1.0, 0.0))
    _, idx = jax.lax.top_k(sel_key, roi_batch)
    picked_fg = fg_keep[idx]
    picked_bg = bg_keep[idx]

    s_rois = all_rois[idx]
    labels = jnp.where(picked_fg, mcls[idx],
                       jnp.where(picked_bg, 0, -1)).astype(jnp.int32)
    deltas = bbox_transform(s_rois, mboxes[idx])
    deltas = (deltas - jnp.asarray(bbox_means)) / jnp.asarray(bbox_stds)
    bbox_targets = jnp.where(picked_fg[:, None], deltas, 0.0)
    bbox_weight = picked_fg.astype(jnp.float32)
    return CfmTargets(s_rois, labels, bbox_targets, bbox_weight, all_masks[idx])
