"""CFM — Convolutional Feature Masking path (the reference's secondary mode).

≙ the reference's CFM variants (SURVEY.md §3.5): instead of RPN proposals +
a learned mask head, classification runs over PRE-COMPUTED segment proposals
(MCG): each segment's box is RoI-warped from the shared trunk features and
mask-pooled with the segment's OWN mask (resized to the warp grid), then
classified by the standard fc head — no RPN, no mask regression.

Reuses the MNC module's trunk and classify head, so a trained MNC checkpoint
evaluates in CFM mode directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mnc_tpu.models.mnc import MNC, stage_bridge


def cfm_apply(
    model: MNC,
    params,
    image: jnp.ndarray,
    im_info: jnp.ndarray,
    seg_boxes: jnp.ndarray,
    seg_masks: jnp.ndarray,
    seg_valid: jnp.ndarray,
    refine_boxes: bool = True,
) -> dict:
    """Classify precomputed segments.

    Args:
      model/params: an MNC model (only trunk + classify head are used).
      image: (H, W, 3) preprocessed canvas.
      im_info: (h, w, scale).
      seg_boxes: (N, 4) segment bounding boxes (canvas coords, padded).
      seg_masks: (N, M, M) binary segment masks in their box frames.
      seg_valid: (N,) padding mask.
      refine_boxes: also apply the class-specific bbox regression.

    Returns dict: cls_prob (N, C), boxes (N, 4), masks (=input masks),
    valid (N,).
    """
    arch = model.arch
    feat = model.apply(params, image, method=MNC.features)
    roi_feat = model.apply(params, feat, seg_boxes, method=MNC.warp)
    # Feed the GIVEN segment mask through the classify stage in logit space
    # (classify_stage applies sigmoid + resize-to-warp-grid itself).
    n = seg_masks.shape[0]
    soft = jax.image.resize(seg_masks.astype(jnp.float32),
                            (n, arch.mask_size, arch.mask_size), method="linear")
    p = jnp.clip(soft, 1e-4, 1.0 - 1e-4)
    pseudo_logits = jnp.log(p) - jnp.log1p(-p)
    cls_logits, bbox_pred = model.apply(
        params, roi_feat, pseudo_logits, method=MNC.classify_stage)
    cls_prob = jax.nn.softmax(cls_logits, axis=-1)
    boxes = seg_boxes
    if refine_boxes:
        boxes = stage_bridge(seg_boxes, cls_prob, bbox_pred, im_info, arch)
    return {
        "cls_prob": cls_prob,
        "boxes": boxes,
        "masks": seg_masks,
        "valid": seg_valid,
    }


def cfm_detect(
    model: MNC,
    params,
    image: jnp.ndarray,
    im_info: jnp.ndarray,
    seg_boxes: jnp.ndarray,
    seg_masks: jnp.ndarray,
    seg_valid: jnp.ndarray,
    post,
    refine_boxes: bool = True,
) -> dict:
    """Full CFM test-mode inference: segments → classified detections.

    ≙ the reference's CFM test graph + tester post-processing: cfm_apply
    scores every segment, then the standard per-class NMS / mask voting /
    canvas paste-back (``postprocess_detections``) produces the detection
    set.  Jit this whole function (static: model, post).
    """
    from mnc_tpu.pipeline.inference import postprocess_detections

    out = cfm_apply(model, params, image, im_info, seg_boxes, seg_masks,
                    seg_valid, refine_boxes=refine_boxes)
    soft = jnp.clip(out["masks"].astype(jnp.float32), 1e-4, 1.0 - 1e-4)
    pseudo_logits = jnp.log(soft) - jnp.log1p(-soft)
    return postprocess_detections(out["boxes"], out["valid"], out["cls_prob"],
                                  pseudo_logits, post, model.arch.canvas)
