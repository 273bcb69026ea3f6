#!/usr/bin/env python
"""Pre-NMS working-set and per-class-capacity study (round-1 verdict item 4).

The build defaults to pre-NMS top-1024 (test) where the reference used 6000,
and caps per-class detections at 16 where the reference kept all NMS
survivors.  With ``nms_tiled`` the reference budgets are now runnable; this
study measures what the defaults actually cost, using a TRAINED full-scale
model on the synthetic val set:

  - proposal recall (gt boxes covered by a proposal at IoU .5/.7)
  - detection mAP^r@0.5/0.7
  - per-image latency (chained-dispatch timing)

    python tools/workingset_study.py --params output/e2e_fullscale_r2b/e2e_params.npz
"""

import _init_paths  # noqa: F401
import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="output/e2e_fullscale_r2b/e2e_params.npz")
    ap.add_argument("--eval-images", type=int, default=64)
    ap.add_argument("--instances", type=int, nargs=2, default=None,
                    metavar=("MIN", "MAX"),
                    help="instances per val image (default: generator "
                         "default ≤6; use with --seed 202 to reproduce the "
                         "crowd_study val set)")
    ap.add_argument("--seed", type=int, default=99, help="val generator seed")
    ap.add_argument("--post-nms", type=int, nargs="*", default=None,
                    help="additional sweep: post-NMS proposal budgets at the "
                         "LAST --pre-nms value (reference test-time is 300; "
                         "crowded scenes may be proposal-starved at 304 — "
                         "also lifts max_per_image to 304 for these runs)")
    ap.add_argument("--pre-nms", type=int, nargs="*",
                    default=(512, 1024, 2048, 6000))
    ap.add_argument("--dets-per-class", type=int, nargs="*", default=(16, 100))
    ap.add_argument("--append", default=None,
                    help="append result JSON lines to this file (one config "
                         "per process keeps tunnel sessions short)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.data.eval_sds import collect_detections, eval_sds
    from mnc_tpu.data.synth_imdb import SyntheticIMDB
    from mnc_tpu.models.mnc import MNC, MNCArch, propose_rois
    from mnc_tpu.ops.bbox import bbox_overlaps
    from mnc_tpu.pipeline.inference import (
        MNCPipeline, PostCfg, unpack_canvas_masks)
    from mnc_tpu.utils.checkpoint import load_npz

    base = MNCArch(
        canvas=(640, 1024), anchor_scales=(8, 16, 32), num_classes=6,
        mask_size=21, warp_hw=14, n_stages=5, fc_dim=4096, mask_fc_dim=256,
        pre_nms_top_n=2048, post_nms_top_n=304, rpn_min_size=16.0,
        trunk_frozen=0,
    )
    # device_put ONCE — numpy params would re-upload ~0.5 GB per jitted call
    # over the tunnel (the mistake that made the first run look wedged)
    params = jax.device_put(load_npz(args.params))
    gen_kw = dict(max_gt=6)
    if args.instances:
        gen_kw = dict(max_gt=args.instances[1], n_range=tuple(args.instances))
    val = SyntheticIMDB(canvas_hw=base.canvas, num_classes=base.num_classes,
                        gt_mask_size=28,
                        num_images=args.eval_images, seed=args.seed, **gen_kw)
    val_ex = [val.example(i) for i in val.image_index]
    gt = val.gt_instances()

    def recall_fn(model):
        arch = model.arch
        anchors = jnp.asarray(arch.all_anchors())

        @jax.jit
        def props(params, image, im_info, gt_boxes, gt_valid):
            feat = model.apply(params, image, method=MNC.features)
            rpn_cls, rpn_bbox = model.apply(params, feat, method=MNC.rpn)
            rois, valid, _ = propose_rois(rpn_cls, rpn_bbox, im_info, anchors,
                                          arch)
            ov = bbox_overlaps(gt_boxes, rois)
            ov = jnp.where(valid[None, :], ov, 0.0)
            best = jnp.max(ov, axis=1)
            return best, gt_valid

        return props

    results = []

    def evaluate(arch, post, label):
        model = MNC(arch=arch)
        pipe = MNCPipeline(model, params, post)
        props = recall_fn(model)
        dets, best_all, nval = [], [], 0
        t_det = 0.0
        for i, ex in zip(val.image_index, val_ex):
            img = jnp.asarray(ex["image"])
            info = jnp.asarray(ex["im_info"])
            t0 = time.perf_counter()
            out = jax.device_get(pipe.detect_canvas_packed(img, info))
            t_det += time.perf_counter() - t0
            out = unpack_canvas_masks(out, arch.canvas[1])
            dets.extend(collect_detections(out, i, score_thresh=0.05))
            b, v = jax.device_get(props(
                params, img, info, jnp.asarray(ex["gt_boxes"]),
                jnp.asarray(ex["gt_valid"])))
            best_all.extend(b[v].tolist())
            nval += int(v.sum())
        best_all = np.asarray(best_all)
        r5 = eval_sds(dets, gt, val.num_classes, 0.5)["map"]
        r7 = eval_sds(dets, gt, val.num_classes, 0.7)["map"]
        rec = {
            "config": label,
            "recall@.5": round(float((best_all >= 0.5).mean()), 4),
            "recall@.7": round(float((best_all >= 0.7).mean()), 4),
            "map_r_050": round(r5, 4), "map_r_070": round(r7, 4),
            "ms_per_img": round(t_det / len(val_ex) * 1e3, 1),
        }
        print(json.dumps(rec), flush=True)
        if args.append:
            with open(args.append, "a") as f:
                f.write(json.dumps(rec) + "\n")
        results.append(rec)

    for p in args.pre_nms:
        arch = dataclasses.replace(base, pre_nms_top_n=p)
        post = PostCfg(dets_per_class=16, max_per_image=100, vote_top_k=64,
                       score_thresh=0.01)
        evaluate(arch, post, f"pre_nms={p},dets_per_class=16")

    for pn in (args.post_nms or ()):
        arch = dataclasses.replace(base, pre_nms_top_n=args.pre_nms[-1],
                                   post_nms_top_n=pn)
        post = PostCfg(dets_per_class=16, max_per_image=304, vote_top_k=64,
                       score_thresh=0.01)
        evaluate(arch, post,
                 f"pre_nms={args.pre_nms[-1]},post_nms={pn},dets_per_class=16")

    for d in args.dets_per_class:
        if d == 16:
            continue  # covered above at every pre_nms
        arch = dataclasses.replace(base, pre_nms_top_n=1024)
        post = PostCfg(dets_per_class=d, max_per_image=100, vote_top_k=64,
                       score_thresh=0.01)
        evaluate(arch, post, f"pre_nms=1024,dets_per_class={d}")

    print("\nsummary:")
    for r in results:
        print(f"  {r['config']:<32} recall .5/.7 = {r['recall@.5']:.3f}/"
              f"{r['recall@.7']:.3f}  mAP .5/.7 = {r['map_r_050']:.3f}/"
              f"{r['map_r_070']:.3f}  {r['ms_per_img']:.0f} ms/img")


if __name__ == "__main__":
    main()
