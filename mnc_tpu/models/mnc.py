"""The Multi-task Network Cascade, assembled as one XLA program.

This module replaces three things from the reference at once:

1. the declarative prototxt graphs (``models/VGG16/mnc_{3,5}stage/*.prototxt``),
2. the in-graph Python layers that broke device residency
   (``lib/pylayer/proposal_layer.py`` → :func:`propose_rois`;
   ``lib/pylayer/stage_bridge_layer.py`` → :func:`stage_bridge`),
3. the per-image forward of ``lib/caffeWrapper/TesterWrapper.py`` /
   ``tools/demo.py`` (``im_detect``) → :meth:`MNC.__call__`.

Everything is fixed-shape: proposals are a padded top-K with a validity mask,
so the whole 3-/5-stage cascade — trunk → RPN → NMS → RoI warp → mask →
mask-pool → classify → bridge → second pass — jits into a single XLA
executable with zero host round-trips (the north-star requirement).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mnc_tpu import config as C
from mnc_tpu.ops.anchors import shifted_anchors
from mnc_tpu.ops.bbox import bbox_transform_inv, clip_boxes
from mnc_tpu.ops.nms import nms_indices
from mnc_tpu.ops.roi_warp import roi_warp
from mnc_tpu.models.heads import ClassifyHead, MaskHead, RPNHead
from mnc_tpu.models.vgg import VGG16Trunk
from mnc_tpu.models.resnet import ResNetTrunk
from mnc_tpu.utils.blob import device_normalize


def _cap(ref_val: int, static_val: int, ref_key: str, static_key: str) -> int:
    """Reference knob capped by its STATIC compile-time budget — loudly.

    ``warnings`` dedupes repeats, so a capped config warns once per process
    instead of on every ``from_cfg`` call."""
    if ref_val > static_val:
        import warnings

        warnings.warn(
            f"{ref_key}={ref_val} is CAPPED by {static_key}={static_val}; "
            f"the compiled working set is {static_val}. Raise {static_key} "
            f"to actually run the requested budget.", stacklevel=3)
    return min(static_val, ref_val)


@dataclasses.dataclass(frozen=True)
class MNCArch:
    """Static architecture/shape configuration (compile-time constants)."""

    canvas: tuple[int, int] = (640, 1024)
    feat_stride: int = 16
    anchor_scales: tuple = (8, 16, 32)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    num_classes: int = 21
    mask_size: int = 21
    warp_hw: int = 14
    # fc6 input resolution after the classify head's max pool (NET.POOLED_HW;
    # reference ROIPooling→pool5 7×7).  None → warp_hw // 2.
    pooled_hw: int | None = None
    n_stages: int = 5
    trunk: str = "vgg16"
    compute_dtype: Any = jnp.bfloat16
    fc_dim: int = 4096
    mask_fc_dim: int = 256
    dual_pathway: bool = False
    # ResNet only: run the conv5 stage per-RoI after warping (the reference
    # COCO-winning head, SURVEY.md §0) instead of the fc6/fc7 tower.
    roi_conv5: bool = False
    # ResNet stride placement: False = v1 (stride on the 1×1 — the original
    # MSRA/Caffe geometry, reference parity); True = v1.5 (stride on the 3×3
    # — REQUIRED for torchvision-pretrained weights).  Mismatched geometry
    # imports cleanly (shapes agree) but computes features the weights were
    # never trained for — the importer checks this (utils/weights.py).
    resnet_stride_in_3x3: bool = False
    # proposal shapes
    pre_nms_top_n: int = 1024
    post_nms_top_n: int = 304
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 16.0
    # proposal-NMS tile size: working sets larger than this use the exact
    # tiled scan (ops/nms.py::nms_tiled) instead of the (K, K) fixpoint,
    # making the reference's 6000/12000 pre-NMS budgets runnable.
    # from_cfg overrides via STATIC.NMS_CHUNK (0 = measured TPU optima:
    # 512 train / 256 test — see config.py).
    nms_chunk: int = 1024
    # bbox target normalization constants (folded out at inference/export)
    bbox_means: tuple = (0.0, 0.0, 0.0, 0.0)
    bbox_stds: tuple = (0.1, 0.1, 0.2, 0.2)
    # Whether this model's bbox_pred emits NORMALIZED deltas (training
    # convention).  False for params exported with the stats folded into the
    # weights (export_params / reference snapshot semantics) — the stage
    # bridge must then NOT re-apply stds/means.  npz exports carry this as
    # metadata; tools set it from there.
    bbox_pred_normalized: bool = True
    # TEST.BBOX_REG: when False, the 5-stage bridge keeps the unrefined boxes
    # (second mask/classify pass still runs on them, as in the reference).
    test_bbox_reg: bool = True
    roi_warp_impl: str = "einsum"
    # Trunk blocks/stages with stopped gradients.  The reference froze
    # conv1-conv2 (lr_mult 0) because they were ImageNet-PRETRAINED; when
    # training from random init set 0 — freezing random filters starves the
    # network of low-level features.
    trunk_frozen: int = 2
    # Suppress proposals from anchor TYPES that can never receive training
    # signal on this canvas (see trainable_anchor_mask).  Right when the
    # weights were trained from scratch at this canvas; turn OFF when running
    # imported/foreign weights (reference ProposalLayer scores all anchors).
    suppress_untrainable_anchors: bool = True
    # Rematerialize the trunk in backward (jax.checkpoint): trades ~1/3 more
    # FLOPs for dropping all trunk activations from HBM — lets the training
    # batch grow on memory-bound configs.
    remat_trunk: bool = False
    # TEST.INT8: run trunk convs (VGG + ResNet) and fc6/fc7/fc_mask (+ the
    # per-RoI conv5 head) on the int8 MXU path (ops/quant.py — dynamic
    # activation scales, per-channel weight scales, identical param tree).
    # Inference only; from_cfg never sets it for train=True.
    int8_inference: bool = False
    # NET.S2D_BLOCK1: run VGG block 1 in 2x2 space-to-depth layout (exact
    # math, half-resolution HBM traffic, MXU-friendly contraction depths —
    # models/vgg.py). Layout-only: param tree and checkpoints unchanged.
    s2d_block1: bool = False
    # NET.FUSED_BLOCK1: run VGG block 1 as the fused Pallas kernel
    # (conv1_1→relu→conv1_2→relu→pool1 entirely in VMEM —
    # ops/pallas/block1_kernel.py). Layout-only: param tree unchanged;
    # matches the XLA path within 1 bf16 ulp. Requires H % 8 == 0.
    fused_block1: bool = False
    # Keep the three structural dodges around the TPU-worker gather fault
    # bisected in round 3 (batch-8 608×816 / 38×51 grid): the
    # optimization_barrier after the top-K gather, presorted NMS, and
    # lax.map (not vmap) propose in apply_batch.  ONLY tools/fault_repro.py
    # sets False — it reconstructs the original faulting composition to
    # re-test the platform after updates.  All dodges are selection-exact,
    # so False must produce identical outputs wherever it survives.
    fault_dodges: bool = True

    def __post_init__(self):
        if self.pooled_hw is None:
            object.__setattr__(self, "pooled_hw", max(self.warp_hw // 2, 1))
        assert self.warp_hw % self.pooled_hw == 0, (
            f"warp_hw {self.warp_hw} must be a multiple of pooled_hw "
            f"{self.pooled_hw} (the classify head pools warp_hw→pooled_hw)")
        # clamp the static NMS working set to the actual anchor count
        fh = self.canvas[0] // self.feat_stride
        fw = self.canvas[1] // self.feat_stride
        total = fh * fw * len(self.anchor_scales) * len(self.anchor_ratios)
        pre = min(self.pre_nms_top_n, total)
        object.__setattr__(self, "pre_nms_top_n", pre)
        object.__setattr__(self, "post_nms_top_n", min(self.post_nms_top_n, pre))

    @classmethod
    def from_cfg(cls, train: bool = False, **overrides) -> "MNCArch":
        cfg = C.cfg
        kw = dict(
            canvas=tuple(cfg.STATIC.CANVAS),
            feat_stride=cfg.STATIC.FEAT_STRIDE,
            anchor_scales=tuple(cfg.NET.ANCHOR_SCALES),
            anchor_ratios=tuple(cfg.NET.ANCHOR_RATIOS),
            num_classes=cfg.NET.NUM_CLASSES,
            mask_size=cfg.MASK_SIZE,
            warp_hw=cfg.NET.WARP_HW,
            pooled_hw=cfg.NET.POOLED_HW,
            n_stages=cfg.NET.N_STAGES,
            trunk=cfg.NET.TRUNK,
            compute_dtype=jnp.dtype(cfg.NET.COMPUTE_DTYPE),
            fc_dim=cfg.NET.FC_DIM,
            mask_fc_dim=cfg.NET.MASK_FC_DIM,
            dual_pathway=cfg.NET.DUAL_PATHWAY,
            roi_conv5=bool(cfg.NET.ROI_CONV5),
            resnet_stride_in_3x3=bool(cfg.NET.RESNET_STRIDE_IN_3X3),
            suppress_untrainable_anchors=bool(
                cfg.NET.SUPPRESS_UNTRAINABLE_ANCHORS),
            # the effective working set is the REFERENCE knob capped by the
            # STATIC compile-time budget (so reference YAMLs lower it 1:1 and
            # STATIC bounds the padded shapes); capping is LOUD so a parity
            # experiment that raises the reference knob can't silently run
            # a smaller working set (VERDICT r2)
            pre_nms_top_n=(_cap(cfg.TRAIN.RPN_PRE_NMS_TOP_N,
                                cfg.STATIC.TRAIN_PRE_NMS_TOP_N,
                                "TRAIN.RPN_PRE_NMS_TOP_N",
                                "STATIC.TRAIN_PRE_NMS_TOP_N") if train
                           else _cap(cfg.TEST.RPN_PRE_NMS_TOP_N,
                                     cfg.STATIC.TEST_PRE_NMS_TOP_N,
                                     "TEST.RPN_PRE_NMS_TOP_N",
                                     "STATIC.TEST_PRE_NMS_TOP_N")),
            # reference knob capped by STATIC, rounded up to the 8-sublane
            # pad (STATIC.TEST_POST_NMS_TOP_N=304 IS the padded 300)
            post_nms_top_n=(_cap(-(-cfg.TRAIN.RPN_POST_NMS_TOP_N // 8) * 8,
                                 cfg.STATIC.TRAIN_POST_NMS_TOP_N,
                                 "TRAIN.RPN_POST_NMS_TOP_N (8-padded)",
                                 "STATIC.TRAIN_POST_NMS_TOP_N")
                            if train
                            else _cap(-(-cfg.TEST.RPN_POST_NMS_TOP_N // 8) * 8,
                                      cfg.STATIC.TEST_POST_NMS_TOP_N,
                                      "TEST.RPN_POST_NMS_TOP_N (8-padded)",
                                      "STATIC.TEST_POST_NMS_TOP_N")),
            rpn_nms_thresh=(cfg.TRAIN.RPN_NMS_THRESH if train else cfg.TEST.RPN_NMS_THRESH),
            rpn_min_size=float(cfg.TRAIN.RPN_MIN_SIZE if train else cfg.TEST.RPN_MIN_SIZE),
            test_bbox_reg=bool(train or cfg.TEST.BBOX_REG),
            bbox_means=(tuple(cfg.TRAIN.BBOX_NORMALIZE_MEANS)
                        if cfg.TRAIN.BBOX_NORMALIZE_TARGETS else (0.0,) * 4),
            bbox_stds=(tuple(cfg.TRAIN.BBOX_NORMALIZE_STDS)
                       if cfg.TRAIN.BBOX_NORMALIZE_TARGETS else (1.0,) * 4),
            int8_inference=bool(cfg.TEST.INT8) and not train,
            nms_chunk=(int(cfg.STATIC.NMS_CHUNK)
                       or (512 if train else 256)),
            s2d_block1=bool(cfg.NET.S2D_BLOCK1),
            fused_block1=bool(cfg.NET.FUSED_BLOCK1),
            trunk_frozen=int(cfg.NET.TRUNK_FROZEN),
            roi_warp_impl=str(cfg.NET.ROI_WARP_IMPL),
        )
        kw.update(overrides)
        return cls(**kw)

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_ratios)

    @property
    def feat_hw(self) -> tuple[int, int]:
        return self.canvas[0] // self.feat_stride, self.canvas[1] // self.feat_stride

    @property
    def spatial_scale(self) -> float:
        return 1.0 / self.feat_stride

    def all_anchors(self) -> np.ndarray:
        fh, fw = self.feat_hw
        return shifted_anchors(fh, fw, self.feat_stride, self.anchor_ratios,
                               self.anchor_scales)

    def trainable_anchor_mask(self) -> np.ndarray:
        """(K,) bool — False for anchors whose TYPE has zero fully-inside
        positions on this canvas.

        AnchorTargetLayer semantics only train anchors fully inside the
        image, per RPN output channel (= anchor type); a type with no inside
        position anywhere gets pure-noise scores at test time (e.g. the
        352×704 ratio-2/scale-32 anchor on a 640-high canvas — also true of
        the reference at 600px, which simply tolerated the noise).  The
        proposal layer zeroes these out.
        """
        a = self.all_anchors()
        h, w = self.canvas
        na = self.num_anchors
        inside = (a[:, 0] >= 0) & (a[:, 1] >= 0) & (a[:, 2] < w) & (a[:, 3] < h)
        type_trainable = inside.reshape(-1, na).any(axis=0)  # (A,)
        return np.tile(type_trainable, a.shape[0] // na)

    def anchor_inside_fraction(self) -> float:
        """Fraction of anchors fully inside the canvas.

        Outside anchors are never trained by AnchorTargetLayer semantics
        (label −1) yet still scored by the proposal layer at test time; if
        most anchors are outside (anchor scales too large for the canvas),
        untrained scores dominate the top-K and proposals degrade.  Keep
        this ≳ 0.3 — tools/train_net.py warns otherwise.
        """
        a = self.all_anchors()
        h, w = self.canvas
        inside = (a[:, 0] >= 0) & (a[:, 1] >= 0) & (a[:, 2] < w) & (a[:, 3] < h)
        return float(inside.mean())


# --------------------------------------------------------------------------- #
# ProposalLayer — on-device (≙ lib/pylayer/proposal_layer.py)
# --------------------------------------------------------------------------- #


def propose_rois(
    rpn_cls: jnp.ndarray,
    rpn_bbox: jnp.ndarray,
    im_info: jnp.ndarray,
    anchors: jnp.ndarray,
    arch: MNCArch,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RPN outputs → padded (post_nms_top_n, 4) RoIs + validity + scores.

    Same algorithm as the reference ProposalLayer (decode → clip → min-size
    filter → top-K by score → NMS → top-N) but fixed-shape and fully
    on-device.  ``im_info = (h, w, scale)`` of the *scaled* image inside the
    padded canvas.

    Channel convention: rpn_cls channels are interleaved per-anchor (bg, fg)
    pairs — channel 2a = bg logit, 2a+1 = fg logit of anchor a — and rpn_bbox
    channels are per-anchor (dx, dy, dw, dh) quads.  (The reference used
    Caffe's (2, A) block layout; the interleaved layout reshapes for free.)

    Note: the reference's PRE_NMS_TOP_N (6000/12000) exceeds the NMS working
    set we keep (arch.pre_nms_top_n); with 23k anchors at canvas scale the
    extra candidates are dominated duplicates — the survivors match.
    """
    a = anchors.shape[0]
    scores_2 = rpn_cls.reshape(-1, 2)  # (K, 2) — (bg, fg) per anchor
    scores = jax.nn.softmax(scores_2, axis=-1)[:, 1]
    deltas = rpn_bbox.reshape(-1, 4)
    assert scores.shape[0] == a, (scores.shape, a)

    boxes = bbox_transform_inv(anchors, deltas)
    boxes = clip_boxes(boxes, (im_info[0], im_info[1]))

    # min-size filter at input scale (reference: RPN_MIN_SIZE * im_scale)
    min_size = arch.rpn_min_size * im_info[2]
    ws = boxes[:, 2] - boxes[:, 0] + 1.0
    hs = boxes[:, 3] - boxes[:, 1] + 1.0
    valid = (ws >= min_size) & (hs >= min_size)
    if arch.suppress_untrainable_anchors:
        # drop anchor types that can never receive training signal on this
        # canvas (off for imported weights — reference scores all anchors)
        valid = valid & jnp.asarray(arch.trainable_anchor_mask())

    # top-K pre-NMS working set
    neg_inf = jnp.finfo(jnp.float32).min
    masked = jnp.where(valid, scores, neg_inf)
    top_scores, top_idx = jax.lax.top_k(masked, arch.pre_nms_top_n)
    # Materialize the (pre_nms, 4) working set before any downstream gather:
    # without this barrier XLA chains the boxes[top_idx] gather with later
    # gathers on its result into one fused kernel that fault-crashes the TPU
    # worker at some canvas grids (batch-8 608×816 / 38×51 grid, bisected in
    # round 3; 640×1024 unaffected).  Cost: one ~100 KB buffer
    # materialization; the downstream NMS reads it repeatedly anyway.
    if arch.fault_dodges:
        top_boxes, top_scores = jax.lax.optimization_barrier(
            (boxes[top_idx], top_scores))
    else:  # tools/fault_repro.py: the original faulting composition
        top_boxes = boxes[top_idx]
    top_valid = top_scores > neg_inf

    # presorted: top_k emits descending scores with the neg_inf padding
    # trailing — nms_indices can skip its argsort (and the re-sort's gather
    # composition, which fault-crashes the TPU worker at some canvas grids;
    # see nms_indices docstring)
    idx, keep_valid = nms_indices(
        top_boxes, top_scores, top_valid, arch.rpn_nms_thresh,
        arch.post_nms_top_n, chunk=arch.nms_chunk,
        presorted=arch.fault_dodges,
    )
    rois = top_boxes[idx]
    roi_scores = jnp.where(keep_valid, top_scores[idx], 0.0)
    return rois, keep_valid, roi_scores


# --------------------------------------------------------------------------- #
# StageBridge — on-device (≙ lib/pylayer/stage_bridge_layer.py)
# --------------------------------------------------------------------------- #


def stage_bridge(
    rois: jnp.ndarray,
    cls_prob: jnp.ndarray,
    bbox_pred: jnp.ndarray,
    im_info: jnp.ndarray,
    arch: MNCArch,
    bbox_pred_normalized: bool | None = None,
) -> jnp.ndarray:
    """Refine RoIs with the predicted class's box deltas (5-stage bridge).

    Picks the argmax foreground class per RoI, applies its 4 deltas
    (de-normalized by the training target stats when the params regress
    normalized targets — the semantic the reference realized by un-normalizing
    fc weights at snapshot time, SURVEY.md §5.4), clips to the image.
    Differentiable w.r.t. both rois and bbox_pred — the path that carries
    stage-4/5 gradients into stage 3.
    """
    if bbox_pred_normalized is None:
        bbox_pred_normalized = arch.bbox_pred_normalized
    n, c = cls_prob.shape
    fg_cls = jnp.argmax(cls_prob[:, 1:], axis=1) + 1  # (N,) ∈ [1, C)
    deltas = bbox_pred.reshape(n, c, 4)
    sel = jnp.take_along_axis(deltas, fg_cls[:, None, None].repeat(4, -1), axis=1)[:, 0]
    if bbox_pred_normalized:
        stds = jnp.asarray(arch.bbox_stds, jnp.float32)
        means = jnp.asarray(arch.bbox_means, jnp.float32)
        sel = sel * stds + means
    refined = bbox_transform_inv(rois, sel)
    return clip_boxes(refined, (im_info[0], im_info[1]))


# --------------------------------------------------------------------------- #
# The cascade module
# --------------------------------------------------------------------------- #


class MNC(nn.Module):
    """Full MNC network: trunk + RPN + shared mask/classify heads.

    ``__call__`` runs test-time inference for one image (vmap/batch outside).
    Training uses the exposed stage methods (``features``, ``rpn``,
    ``mask_stage``, ``classify_stage``) from ``mnc_tpu.train.loop`` so target
    sampling can interleave between stages.
    """

    arch: MNCArch = MNCArch()

    def setup(self):
        a = self.arch
        if a.trunk == "vgg16":
            cls_t, kw = VGG16Trunk, dict(compute_dtype=a.compute_dtype,
                                         frozen_blocks=a.trunk_frozen,
                                         int8=a.int8_inference,
                                         s2d_block1=a.s2d_block1,
                                         fused_block1=a.fused_block1)
        elif a.trunk.startswith("resnet"):
            cls_t, kw = ResNetTrunk, dict(depth=int(a.trunk[6:]),
                                          compute_dtype=a.compute_dtype,
                                          frozen_stages=a.trunk_frozen,
                                          stride_in_3x3=a.resnet_stride_in_3x3,
                                          int8=a.int8_inference)
        else:
            raise ValueError(f"unknown trunk {a.trunk!r}")
        if a.remat_trunk:
            cls_t = nn.remat(cls_t)
        self.trunk = cls_t(**kw)
        self.rpn_head = RPNHead(num_anchors=a.num_anchors, compute_dtype=a.compute_dtype)
        # Stages 2&4 share mask-head weights; stages 3&5 share classify-head
        # weights (reference 5-stage design).
        self.mask_head = MaskHead(mask_size=a.mask_size, fc_dim=a.mask_fc_dim,
                                  compute_dtype=a.compute_dtype,
                                  int8=a.int8_inference)
        if a.roi_conv5:
            from mnc_tpu.models.resnet import ConvRoIHead

            assert a.trunk.startswith("resnet"), \
                "NET.ROI_CONV5 is the ResNet per-RoI conv5 head"
            self.classify_head = ConvRoIHead(
                num_classes=a.num_classes, depth=int(a.trunk[6:]),
                compute_dtype=a.compute_dtype,
                stride_in_3x3=a.resnet_stride_in_3x3,
                int8=a.int8_inference)
        else:
            self.classify_head = ClassifyHead(num_classes=a.num_classes, fc_dim=a.fc_dim,
                                              compute_dtype=a.compute_dtype,
                                              dual_pathway=a.dual_pathway,
                                              pool_window=a.warp_hw // a.pooled_hw,
                                              int8=a.int8_inference)

    # ---- stage pieces (also used by the training loop) ----

    def features(self, image: jnp.ndarray) -> jnp.ndarray:
        # uint8 canvases (TRAIN/TEST.U8_TRANSFER host upload modes) are
        # mean-subtracted here on device; float input passes through
        # untouched, so the normalization is idempotent across entry points
        image = device_normalize(image)
        with jax.named_scope("trunk"):
            return self.trunk(image)

    def rpn(self, feat: jnp.ndarray):
        with jax.named_scope("rpn_head"):
            return self.rpn_head(feat)

    def warp(self, feat: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        a = self.arch
        with jax.named_scope("roi_warp"):
            return roi_warp(feat, rois, (a.warp_hw, a.warp_hw), a.spatial_scale,
                            impl=a.roi_warp_impl)

    def mask_stage(self, roi_feat: jnp.ndarray) -> jnp.ndarray:
        """Warped RoI features → mask logits (N, M, M)."""
        with jax.named_scope("mask_head"):
            return self.mask_head(roi_feat)

    def classify_stage(self, roi_feat: jnp.ndarray, mask_logits: jnp.ndarray,
                       train: bool = False):
        """RoI features + mask logits → (cls_logits, bbox_pred).

        The predicted mask is sigmoided and bilinearly resized M→14 before
        mask pooling (≙ the reference's in-graph mask resize, SURVEY.md §2.2
        "MaskResize").
        """
        a = self.arch
        soft = jax.nn.sigmoid(mask_logits)
        soft14 = jax.image.resize(
            soft, (soft.shape[0], a.warp_hw, a.warp_hw), method="linear")
        return self.classify_head(roi_feat, soft14, train=train)

    # ---- full test-time cascade ----

    def __call__(self, image: jnp.ndarray, im_info: jnp.ndarray) -> dict:
        """(H, W, 3) preprocessed canvas + im_info (h, w, scale) → detections.

        Returns dict with fixed-shape arrays:
          rois         (N, 4)  final boxes (stage-3-refined for 5-stage)
          roi_valid    (N,)    validity mask
          cls_prob     (N, C)  softmax scores (5-stage: two-pass average)
          mask_logits  (N, M, M) final mask logits
          bbox_pred    (N, 4C) raw (normalized) deltas of the LAST classify pass
        """
        a = self.arch
        anchors = jnp.asarray(a.all_anchors())
        feat = self.features(image)
        rpn_cls, rpn_bbox = self.rpn(feat)
        rois, roi_valid, _ = propose_rois(rpn_cls, rpn_bbox, im_info, anchors, a)

        # stages 2-3: mask, then mask-weighted classification
        roi_feat = self.warp(feat, rois)
        mask_logits = self.mask_stage(roi_feat)
        cls_logits, bbox_pred = self.classify_stage(roi_feat, mask_logits)
        cls_prob = jax.nn.softmax(cls_logits, axis=-1)

        out_rois, out_masks, out_prob = rois, mask_logits, cls_prob
        if a.n_stages == 5:
            # stage bridge + stages 4-5 (shared weights), score fusion
            rois2 = (stage_bridge(rois, cls_prob, bbox_pred, im_info, a)
                     if a.test_bbox_reg else rois)
            roi_feat2 = self.warp(feat, rois2)
            mask_logits2 = self.mask_stage(roi_feat2)
            cls_logits2, bbox_pred2 = self.classify_stage(roi_feat2, mask_logits2)
            cls_prob2 = jax.nn.softmax(cls_logits2, axis=-1)
            out_rois = rois2
            out_masks = mask_logits2
            out_prob = 0.5 * (cls_prob + cls_prob2)
            bbox_pred = bbox_pred2

        return {
            "rois": out_rois,
            "roi_valid": roi_valid,
            "cls_prob": out_prob,
            "mask_logits": out_masks,
            "bbox_pred": bbox_pred,
            # first-pass outputs; pooled as extra NMS/voting candidates when
            # PostCfg.vote_both_passes is set (pipeline/inference.py)
            "stage3_rois": rois,
            "stage3_cls_prob": cls_prob,
            "stage3_mask_logits": mask_logits,
        }

    # ---- batched test-time cascade (throughput path) ----

    def apply_batch(self, images: jnp.ndarray, im_infos: jnp.ndarray) -> dict:
        """Image-batched cascade: (B, H, W, 3) + (B, 3) → batched outputs.

        Numerically identical to vmapping ``__call__`` per image, but the fc
        heads run ONCE on the (B·N) flattened RoI set: under a per-image vmap
        XLA re-streams the ~0.5 GB of fc weights from HBM for every image,
        which dominates head time; flattening both amortizes the weight reads
        and widens the matmuls onto full MXU tiles.
        """
        a = self.arch
        b = images.shape[0]
        n = a.post_nms_top_n
        anchors = jnp.asarray(a.all_anchors())

        feat = self.features(images)  # conv trunk is natively batched
        rpn_cls, rpn_bbox = self.rpn(feat)
        # lax.map, NOT vmap: compiles the propose body once UNVMAPPED — the
        # same program structure as the (everywhere-validated) single-image
        # path.  The vmapped propose graph fault-crashes the TPU worker at
        # some canvas grids (batch-8 608×816 / 38×51 grid — bisected round 3;
        # the fault needs the conv+RPN producers, survives an
        # optimization_barrier, and does not reproduce standalone, so it is
        # dodged structurally rather than per-op).  The propose stage is
        # ~2% of batch time; sequentializing it is noise, measured on
        # hardware at 640×1024 (bench.py, see STATUS r3).
        propose_map = jax.lax.map if a.fault_dodges else (
            lambda f, xs: jax.vmap(f)(xs))  # fault_repro: vmapped propose
        rois, roi_valid, _ = propose_map(
            lambda x: propose_rois(x[0], x[1], x[2], anchors, a),
            (rpn_cls, rpn_bbox, im_infos))

        def flat_heads(rois_b):
            roi_feat = jax.vmap(self.warp)(feat, rois_b)  # (B, N, 14, 14, C)
            roi_flat = roi_feat.reshape(b * n, *roi_feat.shape[2:])
            mask_logits = self.mask_stage(roi_flat)
            cls_logits, bbox_pred = self.classify_stage(roi_flat, mask_logits)
            return (mask_logits.reshape(b, n, a.mask_size, a.mask_size),
                    jax.nn.softmax(cls_logits, axis=-1).reshape(b, n, -1),
                    bbox_pred.reshape(b, n, -1))

        mask_logits, cls_prob, bbox_pred = flat_heads(rois)
        out_rois, out_masks, out_prob = rois, mask_logits, cls_prob
        if a.n_stages == 5:
            rois2 = (jax.vmap(lambda r, c, bb, i: stage_bridge(r, c, bb, i, a))(
                rois, cls_prob, bbox_pred, im_infos) if a.test_bbox_reg else rois)
            mask_logits2, cls_prob2, bbox_pred2 = flat_heads(rois2)
            out_rois = rois2
            out_masks = mask_logits2
            out_prob = 0.5 * (cls_prob + cls_prob2)
            bbox_pred = bbox_pred2

        return {
            "rois": out_rois,
            "roi_valid": roi_valid,
            "cls_prob": out_prob,
            "mask_logits": out_masks,
            "bbox_pred": bbox_pred,
            "stage3_rois": rois,
            "stage3_cls_prob": cls_prob,
            "stage3_mask_logits": mask_logits,
        }
