"""Training loop: stage-wise multi-task loss and jitted train step.

≙ the reference ``lib/caffeWrapper/SolverWrapper.py`` + the training prototxt
graph (``models/VGG16/mnc_5stage/train_val.prototxt``): one optimizer step
runs trunk → RPN (+losses) → proposals → RoI sampling (+targets) → mask loss
→ classify losses → [5-stage: bridge → re-targets → mask/classify losses
again, shared weights] → SGD.  Unlike the reference — whose every Python
layer forced a device→host→device hop per iteration — the entire step
including target sampling is ONE jitted XLA program.

Gradients flow through RoI warping into the box coordinates and hence into
``rpn_bbox_pred`` / stage-3 ``bbox_pred`` (the MNC end-to-end trick): RoIs are
produced by differentiable ``bbox_transform_inv`` and gathered by (non-
differentiable, value-carrying) NMS indices, so downstream mask/classify
losses train the upstream regressors exactly as the paper describes.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from mnc_tpu.models.mnc import MNC, MNCArch, propose_rois, stage_bridge
from mnc_tpu.ops.losses import (
    sigmoid_cross_entropy,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from mnc_tpu.train import targets as T


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(jnp.zeros((), jnp.int32), params, tx.init(params))


def _roi_losses(model_vars, model: MNC, feat, tgt: T.RoiTargets, rng, arch: MNCArch,
                prefix: str, bbox_inside_weights=(1.0, 1.0, 1.0, 1.0),
                bbox_reg: bool = True):
    """Mask + classify losses for one cascade pass over sampled RoIs."""
    roi_feat = model.apply(model_vars, feat, tgt.rois, method=MNC.warp)
    mask_logits = model.apply(model_vars, roi_feat, method=MNC.mask_stage)
    mask_loss = sigmoid_cross_entropy(
        mask_logits, tgt.mask_targets, tgt.mask_weight[:, None, None]
    )

    cls_logits, bbox_pred = model.apply(
        model_vars, roi_feat, mask_logits, True,
        method=MNC.classify_stage, rngs={"dropout": rng},
    )
    cls_loss = softmax_cross_entropy(cls_logits, tgt.labels, ignore_label=-1)

    # per-class box regression: select the label's 4-vector from (B, 4C)
    b = bbox_pred.shape[0]
    per_cls = bbox_pred.reshape(b, arch.num_classes, 4)
    lbl = jnp.clip(tgt.labels, 0)
    sel = jnp.take_along_axis(per_cls, lbl[:, None, None].repeat(4, -1), axis=1)[:, 0]
    n_valid = jnp.maximum(jnp.sum((tgt.labels >= 0).astype(jnp.float32)), 1.0)
    if bbox_reg:
        bbox_loss = smooth_l1_loss(
            sel, tgt.bbox_targets,
            inside_weights=tgt.bbox_weight[:, None] * jnp.asarray(bbox_inside_weights),
            outside_weights=jnp.full_like(sel, 1.0) * tgt.bbox_weight[:, None] / n_valid,
        )
    else:  # TRAIN.BBOX_REG=False: no box-regression training signal
        bbox_loss = jnp.zeros(())
    return (
        {f"{prefix}_mask": mask_loss, f"{prefix}_cls": cls_loss, f"{prefix}_bbox": bbox_loss},
        (cls_logits, bbox_pred, mask_logits),
    )


def mnc_loss(params, model: MNC, batch: dict, key: jax.Array, arch: MNCArch,
             anchors: jnp.ndarray, train_cfg: dict):
    """Full multi-task loss for ONE image (vmap outside for image batches).

    batch keys: image (H, W, 3), im_info (3,), gt_boxes (G, 4),
    gt_classes (G,), gt_valid (G,), gt_masks (G, S, S).
    """
    k_anchor, k_roi, k_drop1, k_drop2 = jax.random.split(key, 4)
    im_info = batch["im_info"]
    im_hw = (im_info[0], im_info[1])

    # uint8 canvases from the loader's TRAIN.U8_TRANSFER mode are
    # mean-subtracted on device inside MNC.features
    feat = model.apply(params, batch["image"], method=MNC.features)
    rpn_cls, rpn_bbox = model.apply(params, feat, method=MNC.rpn)

    # ---- stage 1: RPN losses (AnchorTargetLayer semantics)
    at = T.anchor_targets(
        anchors, batch["gt_boxes"], batch["gt_valid"], im_hw, k_anchor,
        pos_overlap=train_cfg["RPN_POSITIVE_OVERLAP"],
        neg_overlap=train_cfg["RPN_NEGATIVE_OVERLAP"],
        batch_size=train_cfg["RPN_BATCHSIZE"],
        fg_fraction=train_cfg["RPN_FG_FRACTION"],
        clobber_positives=train_cfg.get("RPN_CLOBBER_POSITIVES", False),
        positive_weight=train_cfg.get("RPN_POSITIVE_WEIGHT", -1.0),
        inside_weights=train_cfg.get("RPN_BBOX_INSIDE_WEIGHTS",
                                     (1.0, 1.0, 1.0, 1.0)),
    )
    rpn_cls_loss = softmax_cross_entropy(rpn_cls.reshape(-1, 2), at.labels, -1)
    rpn_bbox_loss = smooth_l1_loss(
        rpn_bbox.reshape(-1, 4), at.bbox_targets, at.bbox_inside_w, at.bbox_outside_w,
        sigma=3.0,
    )

    # ---- proposals (differentiable w.r.t. rpn_bbox) + RoI sampling
    rois, roi_valid, _ = propose_rois(rpn_cls, rpn_bbox, im_info, anchors, arch)
    tgt = T.proposal_targets(
        rois, roi_valid, batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
        batch["gt_masks"], k_roi,
        roi_batch=train_cfg["BATCH_SIZE"], fg_fraction=train_cfg["FG_FRACTION"],
        fg_thresh=train_cfg["FG_THRESH"], bg_thresh_hi=train_cfg["BG_THRESH_HI"],
        bg_thresh_lo=train_cfg["BG_THRESH_LO"], mask_size=arch.mask_size,
        bbox_means=arch.bbox_means, bbox_stds=arch.bbox_stds,
    )

    # ---- stages 2-3
    biw = train_cfg.get("BBOX_INSIDE_WEIGHTS", (1.0, 1.0, 1.0, 1.0))
    breg = train_cfg.get("BBOX_REG", True)
    losses, (cls_logits, bbox_pred, _) = _roi_losses(
        params, model, feat, tgt, k_drop1, arch, "s23", bbox_inside_weights=biw,
        bbox_reg=breg)

    if arch.n_stages == 5:
        # ---- bridge + stages 4-5 (shared weights)
        cls_prob = jax.nn.softmax(cls_logits, axis=-1)
        # training regresses NORMALIZED targets by construction, so the bridge
        # always de-normalizes here regardless of arch.bbox_pred_normalized
        rois2 = stage_bridge(tgt.rois, cls_prob, bbox_pred, im_info, arch,
                             bbox_pred_normalized=True)
        tgt2 = T.reassign_targets(
            rois2, tgt.labels, batch["gt_boxes"], batch["gt_classes"],
            batch["gt_valid"], batch["gt_masks"],
            fg_thresh=train_cfg["FG_THRESH"], mask_size=arch.mask_size,
            bbox_means=arch.bbox_means, bbox_stds=arch.bbox_stds,
        )
        losses45, _ = _roi_losses(params, model, feat, tgt2, k_drop2, arch,
                                  "s45", bbox_inside_weights=biw, bbox_reg=breg)
        losses.update(losses45)

    losses["rpn_cls"] = rpn_cls_loss
    losses["rpn_bbox"] = rpn_bbox_loss
    total = sum(losses.values())
    losses["total"] = total
    return total, losses


def build_train_step(model: MNC, tx: optax.GradientTransformation, arch: MNCArch,
                     train_cfg: dict):
    """The UNJITTED train step: (state, batch, key) → (state, metrics).

    ``batch`` may be single-image (dicts of unbatched arrays) or image-batched
    (leading B axis on every array) — the loss is vmapped and averaged, the
    reference's ``IMS_PER_BATCH`` generalized.  Callers wrap it in ``jax.jit``
    (``make_train_step``) or a sharded jit (``parallel/tensor.py``).
    """
    anchors = jnp.asarray(arch.all_anchors())

    def loss_for_batch(params, batch, key):
        if batch["image"].ndim == 3:
            return mnc_loss(params, model, batch, key, arch, anchors, train_cfg)
        b = batch["image"].shape[0]
        keys = jax.random.split(key, b)
        totals, metrics = jax.vmap(
            lambda bt, k: mnc_loss(params, model, bt, k, arch, anchors, train_cfg)
        )(batch, keys)
        return jnp.mean(totals), jax.tree.map(jnp.mean, metrics)

    def step(state: TrainState, batch: dict, key: jax.Array):
        (_, metrics), grads = jax.value_and_grad(loss_for_batch, has_aux=True)(
            state.params, batch, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return step


def make_train_step(model: MNC, tx: optax.GradientTransformation, arch: MNCArch,
                    train_cfg: dict, donate: bool = True):
    """Jitted :func:`build_train_step` (the single-device / auto-SPMD entry)."""
    step = build_train_step(model, tx, arch, train_cfg)
    return jax.jit(step, donate_argnums=(0,) if donate else ())
