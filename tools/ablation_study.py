#!/usr/bin/env python
"""Cascade / voting VALUE ablation (round-2 verdict, next-round item 1).

The paper's claim (CVPR16 Tab. 2, SURVEY.md §6: 3-stage 62.6 → 5-stage 63.5
mAP^r@0.5) is that the stage-4/5 refinement pass and mask voting buy mAP.
This evaluates ONE trained full-scale model under the cascade variants:

    3stage             stages 1-3 only (no bridge / second pass)
    5stage_nobboxreg   5-stage but TEST.BBOX_REG off (bridge passes rois
                       through unrefined — isolates the refinement value)
    5stage             the shipped default
    5stage_novote      mask voting off (TEST.USE_MASK_MERGE false)
    5stage_voteboth    both passes pooled as voting candidates

All variants share weights (stages 4-5 reuse stage-2/3 parameters, exactly
the reference's weight sharing), so differences are pure cascade effects.

    python tools/ablation_study.py --params output/e2e_fullscale_24k/e2e_params.npz \
        --append docs/results/ablation_r3.jsonl
"""

import _init_paths  # noqa: F401
import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="output/e2e_fullscale_24k/e2e_params.npz")
    ap.add_argument("--eval-images", type=int, default=64)
    ap.add_argument("--only", default=None,
                    help="run a single variant (one config per process keeps "
                         "tunnel sessions short)")
    ap.add_argument("--pre-nms", type=int, default=1024)
    ap.add_argument("--mask-size", type=int, default=21,
                    help="must match the trained checkpoint's MASK_SIZE "
                         "(28 for the best-recipe flagship)")
    ap.add_argument("--coco-ap", action="store_true",
                    help="also report COCO-style averaged AP^r@[.5:.95] "
                         "per variant (eval_sds_averaged)")
    ap.add_argument("--append", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny arch + random params on CPU (plumbing check)")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mnc_tpu.data.eval_sds import (collect_detections, eval_sds,
                                       eval_sds_averaged)
    from mnc_tpu.data.synth_imdb import SyntheticIMDB
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import (
        MNCPipeline, PostCfg, unpack_canvas_masks)
    from mnc_tpu.utils.checkpoint import load_npz

    if args.smoke:
        base = MNCArch(
            canvas=(96, 128), anchor_scales=(2, 4, 8), num_classes=4,
            mask_size=9, warp_hw=4, n_stages=5, fc_dim=48, mask_fc_dim=24,
            pre_nms_top_n=64, post_nms_top_n=16, rpn_min_size=4.0,
            compute_dtype=jnp.float32,
        )
        args.eval_images = min(args.eval_images, 4)
    else:
        base = MNCArch(
            canvas=(640, 1024), anchor_scales=(8, 16, 32), num_classes=6,
            mask_size=args.mask_size, warp_hw=14, n_stages=5, fc_dim=4096,
            mask_fc_dim=256, pre_nms_top_n=args.pre_nms, post_nms_top_n=304,
            rpn_min_size=16.0, trunk_frozen=0,
        )
    if args.smoke:
        m0 = MNC(arch=base)
        params = m0.init(jax.random.PRNGKey(0),
                         jnp.zeros((*base.canvas, 3), jnp.float32),
                         jnp.array([*base.canvas, 1.0]))
    else:
        params = jax.device_put(load_npz(args.params))
    val = SyntheticIMDB(canvas_hw=base.canvas, num_classes=base.num_classes,
                        max_gt=6, gt_mask_size=28,
                        num_images=args.eval_images, seed=99)
    val_ex = [val.example(i) for i in val.image_index]
    gt = val.gt_instances()

    post0 = PostCfg(dets_per_class=16, max_per_image=100, vote_top_k=64,
                    score_thresh=0.01)
    variants = {
        "3stage": (dataclasses.replace(base, n_stages=3), post0),
        "5stage_nobboxreg": (dataclasses.replace(base, test_bbox_reg=False),
                             post0),
        "5stage": (base, post0),
        "5stage_novote": (base,
                          dataclasses.replace(post0, use_mask_merge=False)),
        "5stage_voteboth": (base,
                            dataclasses.replace(post0, vote_both_passes=True)),
        # VERDICT r2 item 7: the deliberate deviation — score only anchor
        # types trainable on this canvas — measured OFF (reference scored all)
        "5stage_nosuppress": (dataclasses.replace(
            base, suppress_untrainable_anchors=False), post0),
        # int8 MXU inference path (TEST.INT8, ops/quant.py) on the same
        # float weights — the accuracy half of the quantization trade
        "5stage_int8": (dataclasses.replace(base, int8_inference=True),
                        post0),
        # TEST.VOTE_BOXES: score-weighted box averaging over the voting
        # neighbor set (the mv.pyx ⚠box half — VERDICT r3 item 4)
        "5stage_voteboxes": (base,
                             dataclasses.replace(post0, vote_boxes=True)),
    }
    if args.only:
        variants = {args.only: variants[args.only]}

    results = []
    for label, (arch, post) in variants.items():
        model = MNC(arch=arch)
        pipe = MNCPipeline(model, params, post)
        dets = []
        t_det = 0.0
        for i, ex in zip(val.image_index, val_ex):
            img = jnp.asarray(ex["image"])
            info = jnp.asarray(ex["im_info"])
            t0 = time.perf_counter()
            out = jax.device_get(pipe.detect_canvas_packed(img, info))
            t_det += time.perf_counter() - t0
            out = unpack_canvas_masks(out, arch.canvas[1])
            dets.extend(collect_detections(out, i, score_thresh=0.05))
        rec = {
            "config": label,
            "map_r_050": round(eval_sds(dets, gt, val.num_classes, 0.5)["map"], 4),
            "map_r_070": round(eval_sds(dets, gt, val.num_classes, 0.7)["map"], 4),
            "ms_per_img": round(t_det / len(val_ex) * 1e3, 1),
            "pre_nms": args.pre_nms,
            "mask_size": args.mask_size,
            "n_images": len(val_ex),
        }
        if args.coco_ap:
            avg = eval_sds_averaged(dets, gt, val.num_classes)
            rec["map_r_avg"] = round(avg["map"], 4)
        print(json.dumps(rec), flush=True)
        if args.append:
            with open(args.append, "a") as f:
                f.write(json.dumps(rec) + "\n")
        results.append(rec)

    print("\nsummary:")
    for r in results:
        avg = (f"  avg[.5:.95]={r['map_r_avg']:.3f}" if "map_r_avg" in r
               else "")
        print(f"  {r['config']:<18} mAP^r .5/.7 = {r['map_r_050']:.3f}/"
              f"{r['map_r_070']:.3f}{avg}  {r['ms_per_img']:.0f} ms/img")


if __name__ == "__main__":
    main()
