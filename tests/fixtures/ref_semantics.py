"""Independent numpy implementations of the Caffe-MNC numeric conventions.

AUTHORSHIP FIREWALL (VERDICT r3 item 1): this module is written standalone
from the documented/recalled semantics of the reference (the CVPR16 MNC paper,
the py-faster-rcnn lineage MNC forks, and SURVEY.md's reconstruction).  It
must NEVER import ``mnc_tpu`` (or jax) — the point is that a semantics bug in
the framework cannot leak into the oracle that checks it.  A test enforces
the import ban (tests/test_golden_parity.py::test_fixture_independence).

Every function cites the reference component whose convention it encodes
(``path†`` = SURVEY.md reconstructed path; the /root/reference mount has
always been empty, so no file:line can exist).  See PARITY_FIXTURES.md for
the fixture → reference map.

Conventions deliberately encoded (the mAP-parity-critical set):
  * pixel boxes are (x1, y1, x2, y2) with the Caffe +1 width: w = x2 - x1 + 1
  * anchor generation rounds with numpy round (half-to-even — the reference
    itself used np.round in generate_anchors)
  * ROI pooling quantizes with C round() (half-AWAY-from-zero: floor(x+0.5)
    for x >= 0 — Caffe roi_pooling_layer.cpp† used ::round)
  * proposal filtering order: decode -> clip -> min-size -> top-K -> NMS -> top-N
  * anchor labeling: inside-image only; per-gt argmax anchors (ALL ties) are
    positive; IoU >= pos_overlap positive; max IoU < neg_overlap negative;
    RPN_CLOBBER_POSITIVES resolves pos∧neg conflicts toward negative
  * SmoothL1 with inside weights (multiply diff) and outside weights
    (multiply loss); sigma scaling per smooth_L1_loss_layer.cu†
  * SoftmaxWithLoss ignore_label=-1 + VALID normalization
  * snapshot weight un-normalization: kernel *= stds, bias = bias*stds+means
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------------------------- #
# anchors — lib/transform/anchors.py† (py-faster-rcnn generate_anchors)
# ----------------------------------------------------------------------------- #


def generate_anchors(base_size=16, ratios=(0.5, 1.0, 2.0), scales=(8, 16, 32)):
    """The canonical 9-anchor enumeration (ratios outer, scales inner)."""
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    base = np.array([0.0, 0.0, base_size - 1.0, base_size - 1.0])

    def to_anchor(w, h, cx, cy):
        return np.array([cx - 0.5 * (w - 1), cy - 0.5 * (h - 1),
                         cx + 0.5 * (w - 1), cy + 0.5 * (h - 1)])

    w0 = base[2] - base[0] + 1.0
    h0 = base[3] - base[1] + 1.0
    cx = base[0] + 0.5 * (w0 - 1.0)
    cy = base[1] + 0.5 * (h0 - 1.0)
    size = w0 * h0
    out = []
    for r in ratios:
        # np.round = half-to-even, exactly as the reference's numpy code
        wr = np.round(np.sqrt(size / r))
        hr = np.round(wr * r)
        ra = to_anchor(wr, hr, cx, cy)
        rw = ra[2] - ra[0] + 1.0
        rh = ra[3] - ra[1] + 1.0
        rcx = ra[0] + 0.5 * (rw - 1.0)
        rcy = ra[1] + 0.5 * (rh - 1.0)
        for s in scales:
            out.append(to_anchor(rw * s, rh * s, rcx, rcy))
    return np.array(out, dtype=np.float32)


def shift_anchors(base_anchors, feat_h, feat_w, stride):
    """All anchors on a (feat_h, feat_w) grid, (y, x, anchor) row-major."""
    out = []
    for y in range(feat_h):
        for x in range(feat_w):
            shift = np.array([x * stride, y * stride, x * stride, y * stride],
                             dtype=np.float64)
            for a in base_anchors:
                out.append(a + shift)
    return np.array(out, dtype=np.float32)


# ----------------------------------------------------------------------------- #
# box math — lib/transform/bbox_transform.py†, lib/utils/cython_bbox.pyx†
# ----------------------------------------------------------------------------- #


def bbox_transform(ex, gt):
    ex = np.asarray(ex, np.float64)
    gt = np.asarray(gt, np.float64)
    ew = ex[:, 2] - ex[:, 0] + 1.0
    eh = ex[:, 3] - ex[:, 1] + 1.0
    ecx = ex[:, 0] + 0.5 * ew
    ecy = ex[:, 1] + 0.5 * eh
    gw = gt[:, 2] - gt[:, 0] + 1.0
    gh = gt[:, 3] - gt[:, 1] + 1.0
    gcx = gt[:, 0] + 0.5 * gw
    gcy = gt[:, 1] + 0.5 * gh
    return np.stack([(gcx - ecx) / ew, (gcy - ecy) / eh,
                     np.log(gw / ew), np.log(gh / eh)], axis=1)


def bbox_transform_inv(boxes, deltas):
    boxes = np.asarray(boxes, np.float64)
    deltas = np.asarray(deltas, np.float64)
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    pcx = deltas[:, 0] * w + cx
    pcy = deltas[:, 1] * h + cy
    pw = np.exp(deltas[:, 2]) * w
    ph = np.exp(deltas[:, 3]) * h
    return np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw - 1.0, pcy + 0.5 * ph - 1.0], axis=1)


def clip_boxes(boxes, im_h, im_w):
    b = np.asarray(boxes, np.float64).copy()
    b[:, 0] = np.clip(b[:, 0], 0.0, im_w - 1.0)
    b[:, 1] = np.clip(b[:, 1], 0.0, im_h - 1.0)
    b[:, 2] = np.clip(b[:, 2], 0.0, im_w - 1.0)
    b[:, 3] = np.clip(b[:, 3], 0.0, im_h - 1.0)
    return b


def bbox_overlaps(boxes, query):
    """Pairwise IoU with +1 widths (cython_bbox semantics)."""
    boxes = np.asarray(boxes, np.float64)
    query = np.asarray(query, np.float64)
    n, k = len(boxes), len(query)
    out = np.zeros((n, k))
    for i in range(n):
        for j in range(k):
            iw = (min(boxes[i, 2], query[j, 2])
                  - max(boxes[i, 0], query[j, 0]) + 1.0)
            ih = (min(boxes[i, 3], query[j, 3])
                  - max(boxes[i, 1], query[j, 1]) + 1.0)
            if iw > 0 and ih > 0:
                ua = ((boxes[i, 2] - boxes[i, 0] + 1.0)
                      * (boxes[i, 3] - boxes[i, 1] + 1.0)
                      + (query[j, 2] - query[j, 0] + 1.0)
                      * (query[j, 3] - query[j, 1] + 1.0) - iw * ih)
                out[i, j] = iw * ih / ua
    return out


# ----------------------------------------------------------------------------- #
# NMS — lib/nms/cpu_nms.pyx† (greedy, identical selections to gpu_nms)
# ----------------------------------------------------------------------------- #


def greedy_nms(boxes, scores, thresh):
    """Greedy IoU NMS.  Returns kept indices into the ORIGINAL arrays, in
    descending-score order (the reference keeps score order)."""
    order = np.argsort(-np.asarray(scores, np.float64), kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = bbox_overlaps(boxes[i:i + 1], boxes[order])[0]
        for j_pos, j in enumerate(order):
            if ious[j_pos] > thresh:
                suppressed[j] = True
    return np.array(keep, dtype=np.int64)


# ----------------------------------------------------------------------------- #
# ProposalLayer — lib/pylayer/proposal_layer.py†
# ----------------------------------------------------------------------------- #


def proposal_layer(fg_scores, deltas, anchors, im_h, im_w, im_scale,
                   min_size, pre_nms_top_n, post_nms_top_n, nms_thresh):
    """decode → clip → min-size filter → top-K → NMS → top-N.

    Args are the reference layer's bottom blobs flattened to per-anchor rows:
    fg_scores (K,), deltas (K, 4), anchors (K, 4).  Returns (boxes, scores)
    of the final proposals in score order (dynamic length).
    """
    boxes = bbox_transform_inv(anchors, deltas)
    boxes = clip_boxes(boxes, im_h, im_w)
    ws = boxes[:, 2] - boxes[:, 0] + 1.0
    hs = boxes[:, 3] - boxes[:, 1] + 1.0
    keep = (ws >= min_size * im_scale) & (hs >= min_size * im_scale)
    boxes = boxes[keep]
    scores = np.asarray(fg_scores, np.float64)[keep]
    order = np.argsort(-scores, kind="stable")[:pre_nms_top_n]
    boxes, scores = boxes[order], scores[order]
    keep = greedy_nms(boxes, scores, nms_thresh)[:post_nms_top_n]
    return boxes[keep], scores[keep]


# ----------------------------------------------------------------------------- #
# AnchorTargetLayer — lib/pylayer/anchor_target_layer.py†
# ----------------------------------------------------------------------------- #


def anchor_target(anchors, gt_boxes, im_h, im_w, pos_overlap=0.7,
                  neg_overlap=0.3, batch_size=256, fg_fraction=0.5,
                  clobber_positives=False, positive_weight=-1.0,
                  inside_weights=(1.0, 1.0, 1.0, 1.0)):
    """RPN labels/targets WITHOUT random subsampling.

    The caller must arrange n_pos <= batch*fg_fraction and
    n_neg <= batch - n_pos so the reference's random subsample is a no-op
    (asserted) — that makes the fixture deterministic.

    Returns (labels, bbox_targets, inside_w, outside_w) over ALL K anchors,
    labels in {-1 ignore, 0 neg, 1 pos}; targets zeroed outside positives.
    """
    k = len(anchors)
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_w) & (anchors[:, 3] < im_h))
    ov = bbox_overlaps(anchors, gt_boxes)
    ov[~inside] = 0.0
    max_ov = ov.max(axis=1)
    argmax_gt = ov.argmax(axis=1)

    labels = -np.ones(k, dtype=np.int64)
    if not clobber_positives:
        labels[inside & (max_ov < neg_overlap)] = 0
    # per-gt argmax anchors, ALL ties (reference: np.where(ov == gt_max))
    gt_max = ov.max(axis=0)
    for g in range(len(gt_boxes)):
        if gt_max[g] > 0:
            labels[inside & (ov[:, g] == gt_max[g])] = 1
    labels[inside & (max_ov >= pos_overlap)] = 1
    if clobber_positives:
        labels[inside & (max_ov < neg_overlap)] = 0

    n_pos = int((labels == 1).sum())
    n_neg = int((labels == 0).sum())
    assert n_pos <= int(batch_size * fg_fraction), "fixture must not subsample"
    assert n_neg <= batch_size - n_pos, "fixture must not subsample"

    targets = np.zeros((k, 4))
    pos = labels == 1
    if pos.any():
        targets[pos] = bbox_transform(anchors[pos], gt_boxes[argmax_gt[pos]])
    in_w = np.zeros((k, 4))
    in_w[pos] = np.asarray(inside_weights)
    out_w = np.zeros((k, 4))
    if positive_weight > 0:
        out_w[labels == 1] = positive_weight / max(n_pos, 1)
        out_w[labels == 0] = (1.0 - positive_weight) / max(n_neg, 1)
    else:
        out_w[labels >= 0] = 1.0 / max(n_pos + n_neg, 1)
    return labels, targets, in_w, out_w


# ----------------------------------------------------------------------------- #
# ROI pooling — caffe-mnc/src/caffe/layers/roi_pooling_layer.cpp†
# ----------------------------------------------------------------------------- #


def _c_round(x):
    """C/C++ std::round — half away from zero (NOT numpy's half-to-even)."""
    return np.floor(np.abs(x) + 0.5) * np.sign(x)


def roi_pool(feat, rois, ph, pw, spatial_scale):
    """Caffe quantized RoI max pooling: corners rounded onto the feature grid
    with C round(); bin (p, q) covers cells [floor(p*bh), ceil((p+1)*bh))
    offset by the rounded corner, clipped to the map; empty bins -> 0."""
    h, w, c = feat.shape
    out = np.zeros((len(rois), ph, pw, c), np.float64)
    for n, roi in enumerate(rois):
        x1 = int(_c_round(roi[0] * spatial_scale))
        y1 = int(_c_round(roi[1] * spatial_scale))
        x2 = int(_c_round(roi[2] * spatial_scale))
        y2 = int(_c_round(roi[3] * spatial_scale))
        rh = max(y2 - y1 + 1, 1)
        rw = max(x2 - x1 + 1, 1)
        # exact rational bin boundaries: floor(a/b) = a//b,
        # ceil(a/b) = (a+b-1)//b.  (Caffe computed these through f32
        # bin_size floats; correctly-rounded f32 agrees with the exact
        # rational at realistic sizes, while float evaluation of either
        # precision is a knife-edge wherever p*rsz/bins is an integer.)
        for p in range(ph):
            hs = min(max((p * rh) // ph + y1, 0), h)
            he = min(max(((p + 1) * rh + ph - 1) // ph + y1, 0), h)
            for q in range(pw):
                ws = min(max((q * rw) // pw + x1, 0), w)
                we = min(max(((q + 1) * rw + pw - 1) // pw + x1, 0), w)
                if he > hs and we > ws:
                    out[n, p, q] = feat[hs:he, ws:we].max(axis=(0, 1))
    return out


# ----------------------------------------------------------------------------- #
# bilinear sampling + mask geometry — lib/transform/mask_transform.py†
# ----------------------------------------------------------------------------- #


def bilinear_sample(img, ys, xs):
    """Zero-padded bilinear sample of (S, T) img at float coords (pixel
    centers at integers).  ys (P,), xs (Q,) -> (P, Q)."""
    s, t = img.shape
    out = np.zeros((len(ys), len(xs)))
    for i, y in enumerate(ys):
        y0 = int(np.floor(y))
        for j, x in enumerate(xs):
            x0 = int(np.floor(x))
            acc = 0.0
            for dy in (0, 1):
                for dx in (0, 1):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < s and 0 <= xx < t:
                        wgt = (1.0 - abs(y - yy)) * (1.0 - abs(x - xx))
                        acc += wgt * img[yy, xx]
            out[i, j] = acc
    return out


def _box_bin_centers(lo, hi, m):
    """Image coords of the m bin centers spanning [lo, hi] (+1 width)."""
    span = hi - lo + 1.0
    return lo + (np.arange(m) + 0.5) / m * span


def intersect_mask(rois, gt_boxes, gt_masks, mask_size, binarize=True):
    """Mask regression targets: sample each gt-box-cropped (S, S) mask over
    the RoI's mask_size x mask_size bin-center grid; RoI area outside the gt
    box is 0 (zero-padded sampling).  ≙ mask_transform.intersect_mask† as
    used by ProposalTargetLayer (maskdb stores gt masks box-cropped at S×S).
    """
    s = gt_masks.shape[-1]
    out = np.zeros((len(rois), mask_size, mask_size))
    for n in range(len(rois)):
        yc_img = _box_bin_centers(rois[n, 1], rois[n, 3], mask_size)
        xc_img = _box_bin_centers(rois[n, 0], rois[n, 2], mask_size)
        gh = gt_boxes[n, 3] - gt_boxes[n, 1] + 1.0
        gw = gt_boxes[n, 2] - gt_boxes[n, 0] + 1.0
        ys = (yc_img - gt_boxes[n, 1]) / gh * s - 0.5
        xs = (xc_img - gt_boxes[n, 0]) / gw * s - 0.5
        out[n] = bilinear_sample(gt_masks[n].astype(np.float64), ys, xs)
    if binarize:
        out = (out >= 0.5).astype(np.float64)
    return out


def mask_vote(kept_boxes, cand_boxes, cand_scores, cand_masks, iou_thresh=0.5):
    """Mask voting (lib/nms/mv.pyx†): for each kept box, the score-weighted
    average of all candidates with IoU >= thresh, each candidate's (M, M)
    soft mask resampled from its own box frame onto the kept box's bin grid
    (zero-padded bilinear).  Returns (N, M, M) float."""
    m = cand_masks.shape[-1]
    iou = bbox_overlaps(kept_boxes, cand_boxes)
    out = np.zeros((len(kept_boxes), m, m))
    for n, kb in enumerate(kept_boxes):
        num = np.zeros((m, m))
        den = 0.0
        yc_img = _box_bin_centers(kb[1], kb[3], m)
        xc_img = _box_bin_centers(kb[0], kb[2], m)
        for k, cb in enumerate(cand_boxes):
            if iou[n, k] < iou_thresh:
                continue
            ch = max(cb[3] - cb[1] + 1.0, 1.0)
            cw = max(cb[2] - cb[0] + 1.0, 1.0)
            ys = (yc_img - cb[1]) / ch * m - 0.5
            xs = (xc_img - cb[0]) / cw * m - 0.5
            num += cand_scores[k] * bilinear_sample(
                cand_masks[k].astype(np.float64), ys, xs)
            den += cand_scores[k]
        out[n] = num / max(den, 1e-8)
    return out


def box_vote(kept_boxes, cand_boxes, cand_scores, iou_thresh=0.5):
    """Score-weighted box averaging over IoU neighbors (the box-averaging
    half of lib/nms/mv.pyx†, SURVEY §2.1 ⚠detail — behind TEST.VOTE_BOXES)."""
    iou = bbox_overlaps(kept_boxes, cand_boxes)
    out = np.array(kept_boxes, np.float64, copy=True)
    for n in range(len(kept_boxes)):
        w = np.where(iou[n] >= iou_thresh, np.asarray(cand_scores, np.float64), 0.0)
        if w.sum() > 1e-8:
            out[n] = (w[:, None] * cand_boxes).sum(axis=0) / w.sum()
    return out


# ----------------------------------------------------------------------------- #
# StageBridge — lib/pylayer/stage_bridge_layer.py†
# ----------------------------------------------------------------------------- #


def stage_bridge(rois, cls_prob, bbox_pred, im_h, im_w,
                 bbox_means=(0.0, 0.0, 0.0, 0.0), bbox_stds=(0.1, 0.1, 0.2, 0.2)):
    """Refine each RoI with its argmax FOREGROUND class's deltas,
    de-normalized by the training target stats, then clip."""
    n, c = cls_prob.shape
    fg_cls = cls_prob[:, 1:].argmax(axis=1) + 1
    deltas = bbox_pred.reshape(n, c, 4)[np.arange(n), fg_cls]
    deltas = deltas * np.asarray(bbox_stds) + np.asarray(bbox_means)
    return clip_boxes(bbox_transform_inv(rois, deltas), im_h, im_w)


# ----------------------------------------------------------------------------- #
# ProposalTargetLayer — lib/pylayer/proposal_target_layer.py† (deterministic)
# ----------------------------------------------------------------------------- #


def proposal_target(rois, gt_boxes, gt_classes, gt_masks, roi_batch=128,
                    fg_fraction=0.25, fg_thresh=0.5, bg_thresh_hi=0.5,
                    bg_thresh_lo=0.0, mask_size=21,
                    bbox_means=(0.0, 0.0, 0.0, 0.0),
                    bbox_stds=(0.1, 0.1, 0.2, 0.2)):
    """Deterministic-regime proposal targets: gt boxes appended to the pool,
    fg = IoU >= fg_thresh, bg = [lo, hi).  Caller must keep n_fg <= the fg
    quota and n_bg <= roi_batch - n_fg (asserted), so the reference's random
    subsample keeps everything; output is fg rows (pool order) then bg rows
    then -1 padding.

    Returns (rois, labels, bbox_targets(normalized), bbox_weight,
    mask_targets, mask_weight) padded to roi_batch rows.
    """
    pool = np.concatenate([rois, gt_boxes], axis=0)
    ov = bbox_overlaps(pool, gt_boxes)
    max_ov = ov.max(axis=1)
    arg = ov.argmax(axis=1)
    fg = max_ov >= fg_thresh
    bg = (max_ov < bg_thresh_hi) & (max_ov >= bg_thresh_lo) & ~fg
    n_fg = int(fg.sum())
    assert n_fg <= int(round(roi_batch * fg_fraction)), "fixture must not subsample"
    assert int(bg.sum()) <= roi_batch - n_fg, "fixture must not subsample"

    order = np.concatenate([np.where(fg)[0], np.where(bg)[0]])
    n_real = len(order)
    s_rois = np.zeros((roi_batch, 4))
    s_rois[:n_real] = pool[order]
    labels = -np.ones(roi_batch, dtype=np.int64)
    labels[:n_fg] = np.asarray(gt_classes)[arg[order[:n_fg]]]
    labels[n_fg:n_real] = 0

    tgt = np.zeros((roi_batch, 4))
    if n_fg:
        d = bbox_transform(pool[order[:n_fg]], gt_boxes[arg[order[:n_fg]]])
        tgt[:n_fg] = (d - np.asarray(bbox_means)) / np.asarray(bbox_stds)
    w = np.zeros(roi_batch)
    w[:n_fg] = 1.0
    mt = np.zeros((roi_batch, mask_size, mask_size))
    if n_fg:
        sel = order[:n_fg]
        mt[:n_fg] = intersect_mask(pool[sel], gt_boxes[arg[sel]],
                                   gt_masks[arg[sel]], mask_size)
    return s_rois, labels, tgt, w, mt, w


# ----------------------------------------------------------------------------- #
# losses — smooth_L1_loss_layer†, SoftmaxWithLoss(ignore_label)†, SigmoidCE†
# ----------------------------------------------------------------------------- #


def smooth_l1(pred, targets, inside_w=None, outside_w=None, sigma=1.0):
    d = np.asarray(pred, np.float64) - np.asarray(targets, np.float64)
    if inside_w is not None:
        d = d * inside_w
    s2 = sigma * sigma
    loss = np.where(np.abs(d) < 1.0 / s2, 0.5 * s2 * d * d,
                    np.abs(d) - 0.5 / s2)
    if outside_w is not None:
        loss = loss * outside_w
    return float(loss.sum())


def softmax_ce_ignore(logits, labels, ignore_label=-1):
    """Caffe SoftmaxWithLoss, normalization VALID."""
    logits = np.asarray(logits, np.float64)
    labels = np.asarray(labels)
    z = logits - logits.max(axis=-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
    total, count = 0.0, 0
    flat_logp = logp.reshape(-1, logits.shape[-1])
    flat_lab = labels.reshape(-1)
    for i, lab in enumerate(flat_lab):
        if lab != ignore_label:
            total -= flat_logp[i, lab]
            count += 1
    return total / max(count, 1)


def sigmoid_ce(logits, targets, weights=None):
    """Stable elementwise sigmoid CE; weighted mean over weighted elements."""
    x = np.asarray(logits, np.float64)
    t = np.asarray(targets, np.float64)
    loss = np.maximum(x, 0.0) - x * t + np.log1p(np.exp(-np.abs(x)))
    if weights is None:
        return float(loss.mean())
    w = np.broadcast_to(np.asarray(weights, np.float64), loss.shape)
    return float((loss * w).sum() / max(w.sum(), 1.0))


# ----------------------------------------------------------------------------- #
# snapshot un-normalization — SolverWrapper.snapshot† (SURVEY §5.4)
# ----------------------------------------------------------------------------- #


def snapshot_unnormalize(kernel, bias, bbox_means, bbox_stds):
    """Fold bbox-target normalization INTO the bbox_pred weights so the saved
    model predicts raw deltas: kernel' = kernel * stds (per output column),
    bias' = bias * stds + means; stats tiled over the 4*C output columns."""
    kernel = np.asarray(kernel, np.float64)
    bias = np.asarray(bias, np.float64)
    n_out = kernel.shape[-1]
    stds = np.tile(np.asarray(bbox_stds, np.float64), n_out // 4)
    means = np.tile(np.asarray(bbox_means, np.float64), n_out // 4)
    return kernel * stds[None, :], bias * stds + means


def snapshot_renormalize(kernel, bias, bbox_means, bbox_stds):
    """Inverse: pull the stats back OUT of snapshot weights for fine-tuning."""
    kernel = np.asarray(kernel, np.float64)
    bias = np.asarray(bias, np.float64)
    n_out = kernel.shape[-1]
    stds = np.tile(np.asarray(bbox_stds, np.float64), n_out // 4)
    means = np.tile(np.asarray(bbox_means, np.float64), n_out // 4)
    return kernel / stds[None, :], (bias - means) / stds
