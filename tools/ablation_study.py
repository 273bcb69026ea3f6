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

Round-5 protocol (VERDICT r4 item 1): shipped TEST working set (pre-NMS
6000), >=256 images over >=2 val seeds, image-level bootstrap CIs and
PAIRED delta CIs vs the 5stage baseline (shared resample indices; run the
baseline variant FIRST so --only processes can pair against it):

    python tools/ablation_study.py --params output/flagship_r5/e2e_params.npz \
        --mask-size 28 --pre-nms 6000 --eval-images 256 --val-seeds 99 7 \
        --bootstrap 1000 --only 5stage --append docs/results/ablation_r5.jsonl
"""

import _init_paths  # noqa: F401
import argparse
import dataclasses
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="output/e2e_fullscale_24k/e2e_params.npz")
    ap.add_argument("--eval-images", type=int, default=64,
                    help="TOTAL eval images, split across --val-seeds")
    ap.add_argument("--val-seeds", type=int, nargs="*", default=[99],
                    help="val-set generator seeds (≥2 puts sampling noise "
                         "inside the CI — VERDICT r4 item 1)")
    ap.add_argument("--bootstrap", type=int, default=0,
                    help="N image-level bootstrap resamples: mean±95%% CI "
                         "per variant and PAIRED delta CI vs --baseline "
                         "(shared resample indices)")
    ap.add_argument("--baseline", default="5stage",
                    help="variant the paired bootstrap deltas compare to")
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

    from mnc_tpu.data.eval_sds import (bootstrap_map_ci, collect_detections,
                                       eval_sds, eval_sds_averaged,
                                       eval_sds_matches)
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
    # Multi-seed val: args.eval_images split evenly across --val-seeds so
    # val-set generator noise sits INSIDE the bootstrap CI.  Image ids are
    # "s{seed}:{i}" (unique across seeds); order is deterministic given the
    # flags, so the shared resample indices (and hence paired deltas) line
    # up across --only processes.
    per_seed = max(1, args.eval_images // len(args.val_seeds))
    val_ex, ids = [], []
    gt: dict = {}
    for seed in args.val_seeds:
        val = SyntheticIMDB(canvas_hw=base.canvas,
                            num_classes=base.num_classes,
                            max_gt=6, gt_mask_size=28,
                            num_images=per_seed, seed=seed)
        seed_gt = val.gt_instances()
        for i in val.image_index:
            iid = f"s{seed}:{i}"
            ids.append(iid)
            gt[iid] = seed_gt[i]
            val_ex.append((iid, val.example(i)))
    num_classes = base.num_classes

    resamples = None
    if args.bootstrap:
        resamples = np.random.RandomState(0).randint(
            0, len(ids), size=(args.bootstrap, len(ids)))

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
        for iid, ex in val_ex:
            img = jnp.asarray(ex["image"])
            info = jnp.asarray(ex["im_info"])
            t0 = time.perf_counter()
            out = jax.device_get(pipe.detect_canvas_packed(img, info))
            t_det += time.perf_counter() - t0
            out = unpack_canvas_masks(out, arch.canvas[1])
            dets.extend(collect_detections(out, iid, score_thresh=0.05))
        rec = {
            "config": label,
            "map_r_050": round(eval_sds(dets, gt, num_classes, 0.5)["map"], 4),
            "map_r_070": round(eval_sds(dets, gt, num_classes, 0.7)["map"], 4),
            "ms_per_img": round(t_det / len(val_ex) * 1e3, 1),
            "pre_nms": args.pre_nms,
            "mask_size": args.mask_size,
            "n_images": len(val_ex),
            "val_seeds": args.val_seeds,
        }
        if args.coco_ap:
            avg = eval_sds_averaged(dets, gt, num_classes)
            rec["map_r_avg"] = round(avg["map"], 4)
        if args.bootstrap:
            boot = {}
            for key, thr in (("050", 0.5), ("070", 0.7)):
                m = eval_sds_matches(dets, gt, num_classes, thr)
                maps, ci = bootstrap_map_ci(m, ids, resamples=resamples)
                rec[f"ci_{key}"] = [round(ci[0], 4), round(ci[1], 4)]
                boot[key] = maps
            rec["n_boot"] = args.bootstrap
            # Persist bootstrap maps so paired deltas work across --only
            # processes (same flags -> same resample indices).
            if args.append:
                bpath = args.append + ".boot.npz"
                store = (dict(np.load(bpath))
                         if os.path.exists(bpath) else {})
                for key, maps in boot.items():
                    store[f"{label}:{key}"] = maps
                np.savez(bpath, **store)
                if label != args.baseline:
                    for key in ("050", "070"):
                        bk = f"{args.baseline}:{key}"
                        if bk in store:
                            d = boot[key] - store[bk]
                            lo, hi = np.percentile(d, [2.5, 97.5])
                            rec[f"delta_{key}_vs_{args.baseline}"] = [
                                round(float(d.mean()), 4),
                                round(float(lo), 4), round(float(hi), 4)]
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
