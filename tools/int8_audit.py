#!/usr/bin/env python
"""Per-stage int8-vs-bf16 quantization-error audit (VERDICT r4 item 8).

TEST.INT8 (ops/quant.py) runs the trunk convs and the fc6/fc7/fc_mask
towers on the int8 MXU path.  The r3/r4 evidence for "mAP-neutral" was
end-to-end only; this audits WHERE the quantization error enters and how
large it is at each stage interface, on the flagship checkpoint:

  1. trunk features      — int8 convs vs bf16 convs, same image
  2. rpn logits          — each on its own trunk features (error propagated)
  3. proposal agreement  — best-IoU of each int8 RoI vs the bf16 RoI set,
                           plus the fraction of identical boxes
  4. head isolation      — int8 heads vs bf16 heads on IDENTICAL bf16
                           features + rois (pure fc/mask-tower error,
                           no trunk error folded in)
  5. end-to-end          — final cls_prob / sigmoid(mask) deltas, each
                           cascade on its own proposals (what serving sees)

Distributions are reported as p50/p95/max over images × rois.  Working set
is pre-NMS 1024 (per-RoI errors do not depend on the NMS budget; keeps the
single-chip compile short).

    python tools/int8_audit.py --params output/flagship_r5/e2e_params.npz \
        --mask-size 28 --images 16 --append docs/results/int8_audit_r5.jsonl
"""

import _init_paths  # noqa: F401
import argparse
import dataclasses
import json


def pct(x, q):
    import numpy as np

    return round(float(np.percentile(np.asarray(x, np.float64), q)), 6)


def dist(x):
    return {"p50": pct(x, 50), "p95": pct(x, 95),
            "max": round(float(__import__("numpy").max(x)), 6)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="output/flagship_r5/e2e_params.npz")
    ap.add_argument("--mask-size", type=int, default=28)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--append", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.data.synth_imdb import SyntheticIMDB
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.ops.bbox import bbox_overlaps
    from mnc_tpu.utils.checkpoint import load_npz

    if args.cpu:
        base = MNCArch(
            canvas=(128, 192), anchor_scales=(2, 4, 8), num_classes=6,
            mask_size=9, warp_hw=4, n_stages=5, fc_dim=128, mask_fc_dim=32,
            pre_nms_top_n=128, post_nms_top_n=32, rpn_min_size=4.0,
            trunk_frozen=0, compute_dtype=jnp.float32)
        args.images = min(args.images, 2)
    else:
        base = MNCArch(
            canvas=(640, 1024), anchor_scales=(8, 16, 32), num_classes=6,
            mask_size=args.mask_size, warp_hw=14, n_stages=5, fc_dim=4096,
            mask_fc_dim=256, pre_nms_top_n=1024, post_nms_top_n=304,
            rpn_min_size=16.0, trunk_frozen=0,
        )
    arch8 = dataclasses.replace(base, int8_inference=True)
    m_bf = MNC(arch=base)
    m_i8 = MNC(arch=arch8)
    if args.cpu:
        params = m_bf.init(jax.random.PRNGKey(0),
                           jnp.zeros((*base.canvas, 3), jnp.float32),
                           jnp.array([*base.canvas, 1.0]))
    else:
        params = jax.device_put(load_npz(args.params))

    # params is a jit ARGUMENT everywhere, never a closure: closed-over
    # params are baked into the program as constants, and at full scale the
    # fc towers alone (~0.5 GB) push the serialized MLIR past the axon
    # remote-compile body limit (observed: HTTP 413 on the full program).
    _feat_bf = jax.jit(lambda p, im: m_bf.apply(p, im, method=MNC.features))
    _feat_i8 = jax.jit(lambda p, im: m_i8.apply(p, im, method=MNC.features))
    _rpn_bf = jax.jit(lambda p, f: m_bf.apply(p, f, method=MNC.rpn))
    _rpn_i8 = jax.jit(lambda p, f: m_i8.apply(p, f, method=MNC.rpn))
    _full_bf = jax.jit(lambda p, im, ii: m_bf.apply(p, im, ii))
    _full_i8 = jax.jit(lambda p, im, ii: m_i8.apply(p, im, ii))
    feat_bf = lambda im: _feat_bf(params, im)  # noqa: E731
    feat_i8 = lambda im: _feat_i8(params, im)  # noqa: E731
    rpn_bf = lambda f: _rpn_bf(params, f)  # noqa: E731
    rpn_i8 = lambda f: _rpn_i8(params, f)  # noqa: E731
    full_bf = lambda im, ii: _full_bf(params, im, ii)  # noqa: E731
    full_i8 = lambda im, ii: _full_i8(params, im, ii)  # noqa: E731

    def heads(model, feat, rois):
        rf = model.warp(feat, rois)
        ml = model.mask_stage(rf)
        cl, bb = model.classify_stage(rf, ml)
        return ml, jax.nn.softmax(cl, -1), bb

    _heads_bf = jax.jit(lambda p, f, r: m_bf.apply(
        p, method=lambda m: heads(m, f, r)))
    _heads_i8 = jax.jit(lambda p, f, r: m_i8.apply(
        p, method=lambda m: heads(m, f, r)))
    heads_bf = lambda f, r: _heads_bf(params, f, r)  # noqa: E731
    heads_i8 = lambda f, r: _heads_i8(params, f, r)  # noqa: E731

    val = SyntheticIMDB(canvas_hw=base.canvas, num_classes=base.num_classes,
                        max_gt=6, gt_mask_size=28,
                        num_images=args.images, seed=123)

    feat_rel, rpn_abs, roi_iou, roi_same = [], [], [], []
    hd_cls, hd_mask, e2e_cls, e2e_mask = [], [], [], []
    for i in val.image_index:
        ex = val.example(i)
        img = jnp.asarray(ex["image"])
        info = jnp.asarray(ex["im_info"])

        fb = np.asarray(feat_bf(img), np.float32)
        f8 = np.asarray(feat_i8(img), np.float32)
        feat_rel.append(np.abs(f8 - fb).mean() / (np.abs(fb).mean() + 1e-9))

        # rpn logits, each on its own trunk features (propagated error).
        # The rpn head itself is bf16 in both paths, so this isolates how
        # much trunk quantization error survives the 3x3 rpn conv.
        cb_r, _ = rpn_bf(jnp.asarray(fb))
        c8_r, _ = rpn_i8(jnp.asarray(f8))
        rpn_abs.append(float(np.abs(np.asarray(c8_r, np.float32)
                                    - np.asarray(cb_r, np.float32)).max()))

        ob = jax.device_get(full_bf(img, info))
        o8 = jax.device_get(full_i8(img, info))
        vb = np.asarray(ob["roi_valid"], bool)
        v8 = np.asarray(o8["roi_valid"], bool)
        rb, r8 = np.asarray(ob["rois"])[vb], np.asarray(o8["rois"])[v8]
        if len(rb) and len(r8):
            ious = np.asarray(bbox_overlaps(jnp.asarray(r8), jnp.asarray(rb)))
            best = ious.max(1)
            roi_iou.extend(best.tolist())
            roi_same.append(float((best > 0.999).mean()))
        # head isolation: identical features + rois
        rois_shared = jnp.asarray(ob["rois"])
        mb, cb, _ = jax.device_get(heads_bf(jnp.asarray(fb), rois_shared))
        m8, c8, _ = jax.device_get(heads_i8(jnp.asarray(fb), rois_shared))
        hd_cls.extend(np.abs(np.asarray(c8, np.float32)
                             - np.asarray(cb, np.float32))[vb].ravel())
        sig = lambda x: 1 / (1 + np.exp(-np.asarray(x, np.float32)))  # noqa
        hd_mask.extend(np.abs(sig(m8) - sig(mb))[vb].ravel())
        # end-to-end deltas on the int8 path's own matched rois
        e2e_cls.append(np.abs(np.asarray(o8["cls_prob"], np.float32)
                              - np.asarray(ob["cls_prob"], np.float32))
                       [v8 & vb].ravel())
        e2e_mask.append(np.abs(sig(o8["mask_logits"]) -
                               sig(ob["mask_logits"]))[v8 & vb].ravel())

    rec = {
        "metric": "int8_stage_audit",
        "n_images": args.images,
        "mask_size": args.mask_size,
        "trunk_feat_rel_err": dist(feat_rel),
        "rpn_logit_absdiff_max": dist(rpn_abs),
        "proposal_best_iou": dist(roi_iou),
        "proposal_identical_frac": round(float(np.mean(roi_same)), 4),
        "heads_only_cls_prob_absdiff": dist(np.asarray(hd_cls)),
        "heads_only_mask_prob_absdiff": dist(np.asarray(hd_mask)),
        "e2e_cls_prob_absdiff": dist(np.concatenate(e2e_cls)),
        "e2e_mask_prob_absdiff": dist(np.concatenate(e2e_mask)),
    }
    print(json.dumps(rec), flush=True)
    if args.append:
        with open(args.append, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
