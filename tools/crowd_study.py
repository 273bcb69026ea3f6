#!/usr/bin/env python
"""Crowded-scene capacity study (round-2 verdict, next-round item 4).

``dets_per_class=16`` and ``vote_top_k=64`` were measured as free at ≤6
instances/image; the reference kept ALL per-class NMS survivors and voted
over all candidates (SURVEY.md §3.3).  This measures the caps at crowd
densities (20-30 instances/image) with a trained full-scale model:

    python tools/crowd_study.py --params output/e2e_fullscale_24k/e2e_params.npz \
        --append docs/results/crowd_r3.jsonl

Each (dets_per_class, vote_top_k) config reports mAP^r@.5/.7 and per-image
latency; vote_top_k=0 means "all candidates" (the reference behavior).
"""

import _init_paths  # noqa: F401
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="output/e2e_fullscale_24k/e2e_params.npz")
    ap.add_argument("--eval-images", type=int, default=32)
    ap.add_argument("--instances", type=int, nargs=2, default=(20, 30),
                    metavar=("MIN", "MAX"))
    ap.add_argument("--dets-per-class", type=int, nargs="*", default=(16, 64, 100))
    ap.add_argument("--vote-top-k", type=int, nargs="*", default=(64, 0),
                    help="0 = all candidates (reference behavior)")
    ap.add_argument("--only", default=None,
                    help="single 'dets,votek' config per process")
    ap.add_argument("--pre-nms", type=int, default=1024)
    ap.add_argument("--mask-size", type=int, default=21,
                    help="MASK_SIZE the checkpoint was trained with (28 for "
                         "the mnc_5stage_best recipe)")
    ap.add_argument("--anchor-scales", type=int, nargs="*", default=None,
                    help="must match the --params checkpoint's anchors "
                         "(default (8,16,32))")
    ap.add_argument("--append", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny arch + random params on CPU (plumbing check)")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mnc_tpu.data.eval_sds import collect_detections, eval_sds
    from mnc_tpu.data.synth_imdb import SyntheticIMDB
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import (
        MNCPipeline, PostCfg, unpack_canvas_masks)
    from mnc_tpu.utils.checkpoint import load_npz

    if args.smoke:
        arch = MNCArch(
            canvas=(96, 128), anchor_scales=(2, 4, 8), num_classes=4,
            mask_size=9, warp_hw=4, n_stages=5, fc_dim=48, mask_fc_dim=24,
            pre_nms_top_n=64, post_nms_top_n=16, rpn_min_size=4.0,
            compute_dtype=jnp.float32,
        )
        args.eval_images = min(args.eval_images, 4)
    else:
        arch = MNCArch(
            canvas=(640, 1024),
            anchor_scales=tuple(args.anchor_scales or (8, 16, 32)),
            num_classes=6,
            mask_size=args.mask_size, warp_hw=14, n_stages=5, fc_dim=4096,
            mask_fc_dim=256,
            pre_nms_top_n=args.pre_nms, post_nms_top_n=304, rpn_min_size=16.0,
            trunk_frozen=0,
        )
    if args.smoke:
        m0 = MNC(arch=arch)
        params = m0.init(jax.random.PRNGKey(0),
                         jnp.zeros((*arch.canvas, 3), jnp.float32),
                         jnp.array([*arch.canvas, 1.0]))
    else:
        params = jax.device_put(load_npz(args.params))
    lo, hi = args.instances
    val = SyntheticIMDB(canvas_hw=arch.canvas, num_classes=arch.num_classes,
                        max_gt=hi, gt_mask_size=28, n_range=(lo, hi),
                        num_images=args.eval_images, seed=202)
    val_ex = [val.example(i) for i in val.image_index]
    gt = val.gt_instances()
    n_gt = sum(len(v) for v in gt.values())
    print(f"crowd val: {len(val_ex)} images, {n_gt} instances "
          f"({n_gt / len(val_ex):.1f}/image)", flush=True)

    configs = [(d, k) for d in args.dets_per_class for k in args.vote_top_k]
    if args.only:
        d, k = (int(x) for x in args.only.split(","))
        configs = [(d, k)]

    model = MNC(arch=arch)
    results = []
    for dets_pc, vote_k in configs:
        post = PostCfg(dets_per_class=dets_pc, max_per_image=100,
                       vote_top_k=(vote_k if vote_k > 0 else 10**9),
                       score_thresh=0.01)
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
        # does the per-class cap bind?  count reported dets per (image, class):
        # if the max over all cells is < dets_per_class, the cap provably did
        # not truncate anything at this density (direct evidence for the
        # "identical mAP across caps" result).
        from collections import Counter

        cell = Counter((d["image_id"], d["class_id"]) for d in dets)
        max_cell = max(cell.values()) if cell else 0
        rec = {
            "config": f"dets_per_class={dets_pc},vote_top_k={vote_k or 'all'}",
            "max_dets_per_image_class": max_cell,
            "instances_per_image": round(n_gt / len(val_ex), 1),
            "map_r_050": round(eval_sds(dets, gt, val.num_classes, 0.5)["map"], 4),
            "map_r_070": round(eval_sds(dets, gt, val.num_classes, 0.7)["map"], 4),
            "ms_per_img": round(t_det / len(val_ex) * 1e3, 1),
            "n_images": len(val_ex),
        }
        print(json.dumps(rec), flush=True)
        if args.append:
            with open(args.append, "a") as f:
                f.write(json.dumps(rec) + "\n")
        results.append(rec)

    print("\nsummary:")
    for r in results:
        print(f"  {r['config']:<36} mAP^r .5/.7 = {r['map_r_050']:.3f}/"
              f"{r['map_r_070']:.3f}  {r['ms_per_img']:.0f} ms/img")


if __name__ == "__main__":
    main()
