"""mAP^r evaluation — the SDS protocol (Hariharan et al.).

Behavioral port of the reference ``lib/datasets/voc_eval_sds.py``: per class,
rank all detections by score across the dataset, greedily match each to the
highest-mask-IoU unclaimed ground-truth instance of the same class in its
image (match iff IoU ≥ threshold), build the precision/recall curve, and
report VOC-style average precision; mAP^r is the class mean.  The reference
reported mAP^r @0.5 and @0.7 on VOC 2012 SBD val.

Detections and ground truth are exchanged in a dataset-agnostic dict format
so the evaluator serves PASCAL/SBD, COCO and the synthetic dataset alike:

    det  = {image_id, class_id, score, mask (binary, full canvas or
            box-cropped + box)}
    gt   = per image: list of {class_id, mask}

Mask IoU is computed by the native helper (``mnc_tpu.native``) when built,
else numpy.
"""

from __future__ import annotations


import numpy as np


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two aligned binary masks."""
    a = a > 0.5
    b = b > 0.5
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / max(float(union), 1.0)


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    """VOC AP: 11-point (2007) or continuous (2010+, the SDS setting)."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = np.max(prec[rec >= t]) if np.any(rec >= t) else 0.0
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def eval_sds(
    detections: list[dict],
    gt_instances: dict,
    num_classes: int,
    iou_thresh: float = 0.5,
    use_07_metric: bool = False,
) -> dict:
    """Compute per-class AP^r and mAP^r.

    Args:
      detections: list of dicts with keys image_id, class_id, score,
        mask (binary np array in canvas space — must align with gt masks).
      gt_instances: {image_id: list of {"class_id": int, "mask": np.ndarray}}.
      num_classes: total classes including background (class 0 ignored).
      iou_thresh: mask-IoU match threshold (0.5 / 0.7).

    Returns {"ap": {class_id: AP}, "map": float, "thresh": iou_thresh}.
    """
    from mnc_tpu import native

    ap = {}
    for cls in range(1, num_classes):
        dets_c = [d for d in detections if d["class_id"] == cls]
        dets_c.sort(key=lambda d: -d["score"])

        # gather gt of this class per image
        gts_c = {
            img: [g for g in lst if g["class_id"] == cls]
            for img, lst in gt_instances.items()
        }
        npos = sum(len(v) for v in gts_c.values())
        if npos == 0:
            continue
        claimed = {img: np.zeros(len(v), bool) for img, v in gts_c.items()}

        # Precompute det×gt mask-IoU matrices per image in one native
        # (popcount) call each — the evaluator hot loop.
        by_img: dict = {}
        for i, det in enumerate(dets_c):
            by_img.setdefault(det["image_id"], []).append(i)
        iou_of: dict = {}
        for img, det_ids in by_img.items():
            gts = gts_c.get(img, [])
            if not gts:
                continue
            dmasks = np.stack([dets_c[i]["mask"] for i in det_ids])
            gmasks = np.stack([g["mask"] for g in gts])
            mat = native.mask_iou_matrix(dmasks, gmasks)
            for row, i in enumerate(det_ids):
                iou_of[i] = mat[row]

        tp = np.zeros(len(dets_c))
        fp = np.zeros(len(dets_c))
        for i, det in enumerate(dets_c):
            img = det["image_id"]
            ious = iou_of.get(i)
            if ious is None or ious.size == 0:
                fp[i] = 1
                continue
            best_j = int(np.argmax(ious))
            if ious[best_j] >= iou_thresh and not claimed[img][best_j]:
                tp[i] = 1
                claimed[img][best_j] = True
            else:
                fp[i] = 1

        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(fp)
        rec = tp_cum / npos
        prec = tp_cum / np.maximum(tp_cum + fp_cum, np.finfo(np.float64).eps)
        ap[cls] = voc_ap(rec, prec, use_07_metric)

    mean_ap = float(np.mean(list(ap.values()))) if ap else 0.0
    return {"ap": ap, "map": mean_ap, "thresh": iou_thresh}


def collect_detections(det_out: dict, image_id, score_thresh: float = 0.0) -> list[dict]:
    """Flatten one image's pipeline output (MNCPipeline.detect[_canvas] dict,
    already on host) into evaluator det records using canvas/full masks."""
    masks = det_out.get("canvas_masks", det_out.get("full_masks"))
    assert masks is not None, "postprocess must produce pasted masks for eval"
    recs = []
    for k in range(len(det_out["scores"])):
        if not det_out["valid"][k] or det_out["scores"][k] < score_thresh:
            continue
        recs.append({
            "image_id": image_id,
            "class_id": int(det_out["classes"][k]),
            "score": float(det_out["scores"][k]),
            "mask": np.asarray(masks[k]),
        })
    return recs


def print_ap_table(result: dict, class_names=None) -> str:
    """Render the per-class AP table in the reference's printed format."""
    t = result["thresh"]
    t = f"{t:.1f}" if isinstance(t, float) else t
    lines = [f"~~~~~~ Evaluation: mAP^r @ IoU {t} ~~~~~~"]
    for cls, val in sorted(result["ap"].items()):
        name = class_names[cls] if class_names else f"class_{cls:02d}"
        lines.append(f"AP for {name} = {val:.4f}")
    lines.append(f"Mean AP^r = {result['map']:.4f}")
    return "\n".join(lines)


def eval_sds_averaged(
    detections: list[dict],
    gt_instances: dict,
    num_classes: int,
    thresholds=None,
    use_07_metric: bool = False,
) -> dict:
    """COCO-style averaged-threshold region AP: AP^r@[.5:.95].

    Runs the SDS matcher at each IoU threshold (default 0.5:0.05:0.95, the
    COCO convention) and averages per class — the stretch-config metric
    (BASELINE configs[4]; the reference reported COCO seg AP@[.5:.95] for its
    challenge entry).

    Returns {"ap": {cls: averaged AP}, "map": float, "thresh": "0.50:0.95",
             "per_thresh": {t: mAP at t}}.
    """
    if thresholds is None:
        thresholds = np.arange(0.5, 0.951, 0.05)
    thresholds = [round(float(t), 2) for t in thresholds]
    results = {
        t: eval_sds(detections, gt_instances, num_classes, iou_thresh=t,
                    use_07_metric=use_07_metric)
        for t in thresholds
    }
    classes = set()
    for r in results.values():
        classes.update(r["ap"])
    ap = {
        cls: float(np.mean([results[t]["ap"].get(cls, 0.0) for t in thresholds]))
        for cls in sorted(classes)
    }
    mean_ap = float(np.mean(list(ap.values()))) if ap else 0.0
    return {"ap": ap, "map": mean_ap, "thresh": "0.50:0.95",
            "per_thresh": {t: results[t]["map"] for t in thresholds}}
