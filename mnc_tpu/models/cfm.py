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

from mnc_tpu.models.mnc import MNC, MNCArch, stage_bridge


def mask_pseudo_logits(masks: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Binary/soft segment masks → logit space at the classify-stage size.

    ``classify_stage`` applies sigmoid + resize-to-warp-grid itself, so a
    GIVEN segment mask enters as clipped logits of its (out_size²) resize.
    """
    n = masks.shape[0]
    soft = jax.image.resize(masks.astype(jnp.float32),
                            (n, out_size, out_size), method="linear")
    p = jnp.clip(soft, 1e-4, 1.0 - 1e-4)
    return jnp.log(p) - jnp.log1p(-p)


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
    pseudo_logits = mask_pseudo_logits(seg_masks, arch.mask_size)
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


# ---------------------------------------------------------------------------
# CFM training (SURVEY §3.5 — the reference's secondary training mode)
# ---------------------------------------------------------------------------

def cfm_loss(params, model: MNC, batch: dict, key, arch: MNCArch,
             train_cfg: dict):
    """CFM training loss for ONE image (vmap outside for image batches).

    ≙ the CFM train graph: trunk → RoI-warp the SAMPLED precomputed segments
    → mask-pool with each segment's own mask → classify; softmax cls loss
    (ignore −1) + per-class SmoothL1 bbox regression on fg.  No RPN and no
    mask-head loss — CFM classifies given segments (the mask head's params
    receive zero gradient; a fine-tuned MNC checkpoint keeps its mask head).

    batch keys: image, im_info, seg_boxes (K, 4), seg_masks (K, S, S),
    seg_valid (K,), gt_boxes, gt_classes, gt_valid, gt_masks.
    """
    from mnc_tpu.ops.losses import smooth_l1_loss, softmax_cross_entropy
    from mnc_tpu.train.targets import cfm_targets

    k_roi, k_drop = jax.random.split(key)
    feat = model.apply(params, batch["image"], method=MNC.features)
    tgt = cfm_targets(
        batch["seg_boxes"], batch["seg_masks"], batch["seg_valid"],
        batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
        batch["gt_masks"], k_roi,
        roi_batch=train_cfg["BATCH_SIZE"], fg_fraction=train_cfg["FG_FRACTION"],
        fg_thresh=train_cfg["FG_THRESH"], bg_thresh_hi=train_cfg["BG_THRESH_HI"],
        bg_thresh_lo=train_cfg["BG_THRESH_LO"],
        bbox_means=arch.bbox_means, bbox_stds=arch.bbox_stds,
        iou_mode=train_cfg.get("CFM_IOU", "box"))

    roi_feat = model.apply(params, feat, tgt.rois, method=MNC.warp)
    pseudo_logits = mask_pseudo_logits(tgt.seg_masks, arch.mask_size)
    cls_logits, bbox_pred = model.apply(
        params, roi_feat, pseudo_logits, True,
        method=MNC.classify_stage, rngs={"dropout": k_drop})

    cls_loss = softmax_cross_entropy(cls_logits, tgt.labels, ignore_label=-1)
    # per-class box regression, as in the MNC classify stage
    b = bbox_pred.shape[0]
    per_cls = bbox_pred.reshape(b, arch.num_classes, 4)
    lbl = jnp.clip(tgt.labels, 0)
    sel = jnp.take_along_axis(per_cls, lbl[:, None, None].repeat(4, -1), axis=1)[:, 0]
    n_valid = jnp.maximum(jnp.sum((tgt.labels >= 0).astype(jnp.float32)), 1.0)
    biw = jnp.asarray(train_cfg.get("BBOX_INSIDE_WEIGHTS", (1.0,) * 4))
    bbox_loss = smooth_l1_loss(
        sel, tgt.bbox_targets,
        inside_weights=tgt.bbox_weight[:, None] * biw,
        outside_weights=jnp.full_like(sel, 1.0) * tgt.bbox_weight[:, None] / n_valid,
    ) if train_cfg.get("BBOX_REG", True) else jnp.zeros(())

    losses = {"cfm_cls": cls_loss, "cfm_bbox": bbox_loss}
    total = sum(losses.values())
    losses["total"] = total
    return total, losses


def build_cfm_train_step(model: MNC, tx, arch: MNCArch, train_cfg: dict):
    """Unjitted CFM train step: (state, batch, key) → (state, metrics);
    single-image or image-batched (leading B axis), as build_train_step."""
    import optax

    from mnc_tpu.train.loop import TrainState

    def loss_for_batch(params, batch, key):
        if batch["image"].ndim == 3:
            return cfm_loss(params, model, batch, key, arch, train_cfg)
        b = batch["image"].shape[0]
        keys = jax.random.split(key, b)
        totals, metrics = jax.vmap(
            lambda bt, k: cfm_loss(params, model, bt, k, arch, train_cfg)
        )(batch, keys)
        return jnp.mean(totals), jax.tree.map(jnp.mean, metrics)

    def step(state: TrainState, batch: dict, key):
        (_, metrics), grads = jax.value_and_grad(loss_for_batch, has_aux=True)(
            state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return step


def make_cfm_train_step(model: MNC, tx, arch: MNCArch, train_cfg: dict,
                        donate: bool = True):
    """Jitted :func:`build_cfm_train_step`."""
    step = build_cfm_train_step(model, tx, arch, train_cfg)
    return jax.jit(step, donate_argnums=(0,) if donate else ())
