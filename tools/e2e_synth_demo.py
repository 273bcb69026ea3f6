#!/usr/bin/env python
"""Self-contained end-to-end demonstration: train → detect → mAP^r.

Small-config version of experiments/scripts/mnc_synthetic.sh that runs on any
backend in minutes: trains the 5-stage cascade on synthetic shapes, then
evaluates mAP^r@0.5/0.7 with the full jitted detect pipeline.  Prints the
reference-style AP table and a final JSON line.

    python tools/e2e_synth_demo.py [--iters 300] [--cpu] [--eval-images 8]
        [--batch 8] [--eval-every 1000]     # batched SGD + learning curve

With --eval-every N the run logs a mAP^r learning curve to
``output/e2e_metrics.jsonl`` (one JSON object per eval point) — the
convergence evidence VERDICT round 1 asked for.
"""

import _init_paths  # noqa: F401
import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--init-params", default=None,
                    help="npz checkpoint to fine-tune from (e.g. the trained "
                         "flagship, for crowd-density adaptation studies)")
    ap.add_argument("--n-range", type=int, nargs=2, default=None,
                    metavar=("MIN", "MAX"),
                    help="instances per synthetic image (with --max-gt; "
                         "default: generator default, ≤6 at full scale)")
    ap.add_argument("--max-gt", type=int, default=None,
                    help="gt capacity per image (override for crowded scenes)")
    ap.add_argument("--eval-images", type=int, default=8)
    ap.add_argument("--eval-every", type=int, default=0,
                    help="evaluate mAP^r every N iters (0 = only at end)")
    ap.add_argument("--train-images", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--stepsize", type=int, default=None,
                    help="step-LR decay point (default 3/4 of iters)")
    ap.add_argument("--int8-eval", action="store_true",
                    help="after training, also evaluate the final weights on "
                         "the int8 MXU path (TEST.INT8) — accuracy delta")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="output")
    ap.add_argument("--trunk", default="vgg16",
                    choices=("vgg16", "resnet50", "resnet101"),
                    help="conv trunk (--full-scale mode only)")
    ap.add_argument("--mask-size", type=int, default=21,
                    help="MASK_SIZE (--full-scale only; paper says 28, code "
                         "recall says 21 — VERDICT r2 ablation item 6)")
    ap.add_argument("--pre-nms", type=int, default=2048,
                    help="train pre-NMS working set (--full-scale only; "
                         "reference 12000)")
    ap.add_argument("--post-nms", type=int, default=512,
                    help="train post-NMS RoI count (--full-scale only; "
                         "reference 2000)")
    ap.add_argument("--roi-conv5", action="store_true",
                    help="ResNet per-RoI conv5 classify head (reference COCO "
                         "design) instead of the fc6/fc7 tower")
    ap.add_argument("--full-scale", action="store_true",
                    help="reference-scale arch: 640x1024 canvas, full VGG-16 "
                         "heads, MASK_SIZE 21, warp 14, anchors (8,16,32)x16")
    ap.add_argument("--anchor-scales", type=int, nargs="*", default=None,
                    help="override NET.ANCHOR_SCALES (--full-scale only; "
                         "reference (8,16,32) = 128-512 px boxes at stride "
                         "16 — crowded scenes need smaller, e.g. 4 8 16; "
                         "same count keeps --init-params RPN head shapes)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.data.eval_sds import collect_detections, eval_sds, print_ap_table
    from mnc_tpu.data.synth_imdb import SyntheticIMDB
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg
    from mnc_tpu.train.loop import TrainState, make_train_step
    from mnc_tpu.train.optim import make_optimizer
    from mnc_tpu.utils.checkpoint import save_npz

    if args.full_scale:
        # the reference-scale configuration (SURVEY §2.1 defaults), bf16 trunk
        arch = MNCArch(
            canvas=(640, 1024),
            anchor_scales=tuple(args.anchor_scales or (8, 16, 32)),
            num_classes=6,
            mask_size=args.mask_size, warp_hw=14, n_stages=5, fc_dim=4096,
            mask_fc_dim=256,
            pre_nms_top_n=args.pre_nms, post_nms_top_n=args.post_nms,
            rpn_min_size=16.0,
            trunk=args.trunk, trunk_frozen=0,
            # deep trunks at full canvas exceed 16 GB HBM in backward without
            # rematerialization (observed: resnet101 batch 8 OOM)
            remat_trunk=args.trunk != "vgg16",
            roi_conv5=args.roi_conv5,
        )
        train_cfg = dict(
            RPN_POSITIVE_OVERLAP=0.7, RPN_NEGATIVE_OVERLAP=0.3,
            RPN_BATCHSIZE=256, RPN_FG_FRACTION=0.5, BATCH_SIZE=128,
            FG_FRACTION=0.25, FG_THRESH=0.5, BG_THRESH_HI=0.5, BG_THRESH_LO=0.0,
        )
        gt_mask_size, max_gt = 28, 6
    else:
        arch = MNCArch(
            canvas=(96, 128), anchor_scales=(1, 2, 4), num_classes=4, mask_size=13,
            warp_hw=6, n_stages=5, compute_dtype=jnp.float32, fc_dim=256,
            mask_fc_dim=256, pre_nms_top_n=192, post_nms_top_n=48, rpn_min_size=4.0,
            trunk_frozen=0,  # training from scratch — do not freeze random filters
        )
        train_cfg = dict(
            RPN_POSITIVE_OVERLAP=0.6, RPN_NEGATIVE_OVERLAP=0.3, RPN_BATCHSIZE=128,
            RPN_FG_FRACTION=0.5, BATCH_SIZE=64, FG_FRACTION=0.25, FG_THRESH=0.5,
            BG_THRESH_HI=0.5, BG_THRESH_LO=0.0,
        )
        gt_mask_size, max_gt = 24, 4
    if args.max_gt is not None:
        max_gt = args.max_gt
    n_range_kw = {} if args.n_range is None else {"n_range": tuple(args.n_range)}
    imdb = SyntheticIMDB(canvas_hw=arch.canvas, num_classes=arch.num_classes,
                         max_gt=max_gt, gt_mask_size=gt_mask_size,
                         num_images=args.train_images, seed=1, **n_range_kw)
    val = SyntheticIMDB(canvas_hw=arch.canvas, num_classes=arch.num_classes,
                        max_gt=max_gt, gt_mask_size=gt_mask_size,
                        num_images=args.eval_images, seed=99, **n_range_kw)

    model = MNC(arch=arch)
    ex0 = imdb.example(0)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.asarray(ex0["image"]), jnp.asarray(ex0["im_info"]))
    if args.init_params:
        from mnc_tpu.utils.checkpoint import load_npz

        loaded = load_npz(args.init_params)
        chex_shapes = jax.tree.map(lambda a, b: a.shape == b.shape,
                                   params, loaded)
        assert all(jax.tree.leaves(chex_shapes)), \
            "--init-params checkpoint shape mismatch with this arch"
        params = loaded
        print(f"fine-tuning from {args.init_params}", flush=True)
    stepsize = args.stepsize or max(args.iters * 3 // 4, 1)
    tx = make_optimizer(params, base_lr=args.lr, stepsize=stepsize,
                        clip_gradients=10.0)
    step = make_train_step(model, tx, arch, train_cfg)
    state = TrainState.create(params, tx)
    key = jax.random.PRNGKey(args.seed)

    # pre-stage the whole (small) training set on device; per-iter batches are
    # an on-device gather, so the host never touches pixels in the hot loop
    all_ex = {k: jnp.asarray(v)
              for k, v in imdb.gen.batch(imdb.image_index).items()}
    rs = np.random.RandomState(args.seed + 7)

    os.makedirs(args.out, exist_ok=True)
    curve_path = os.path.join(args.out, "e2e_metrics.jsonl")
    curve_f = open(curve_path, "a")

    val_ex = [val.example(i) for i in val.image_index]
    gt = val.gt_instances()
    pipe = MNCPipeline(model, jax.device_get(state.params),
                       PostCfg(dets_per_class=8, max_per_image=12, vote_top_k=24,
                               score_thresh=0.01))

    from mnc_tpu.pipeline.inference import unpack_canvas_masks

    def evaluate(params_now, verbose=False):
        pipe.params = params_now  # device params; avoid host round-trip
        dets = []
        for i, ex in zip(val.image_index, val_ex):
            out = jax.device_get(pipe.detect_canvas_packed(
                jnp.asarray(ex["image"]), jnp.asarray(ex["im_info"])))
            out = unpack_canvas_masks(out, arch.canvas[1])
            dets.extend(collect_detections(out, i, score_thresh=0.05))
        r5 = eval_sds(dets, gt, val.num_classes, 0.5)
        r7 = eval_sds(dets, gt, val.num_classes, 0.7)
        if verbose:
            print(print_ap_table(r5, val.classes), flush=True)
            print(print_ap_table(r7, val.classes), flush=True)
        return r5, r7

    t0 = time.time()
    last_metrics = None
    for it in range(args.iters):
        if args.batch == 1:
            idx = jnp.asarray([it % imdb.num_images])
            batch = jax.tree.map(lambda a: a[idx][0], all_ex)
        else:
            idx = jnp.asarray(rs.randint(0, imdb.num_images, size=args.batch))
            batch = jax.tree.map(lambda a: a[idx], all_ex)
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        last_metrics = metrics
        if (it + 1) % 100 == 0 or it == 0:
            m = jax.device_get(metrics)
            print(f"iter {it + 1}: total={float(m['total']):.3f} "
                  f"mask={float(m['s23_mask']):.3f} cls={float(m['s23_cls']):.3f} "
                  f"({(time.time() - t0):.0f}s)", flush=True)
        if args.eval_every and (it + 1) % args.eval_every == 0 \
                and (it + 1) < args.iters:
            r5, r7 = evaluate(state.params)
            rec = {"iter": it + 1, "map_r_050": round(r5["map"], 4),
                   "map_r_070": round(r7["map"], 4),
                   "total_loss": round(float(jax.device_get(metrics)["total"]), 4),
                   "wall_s": round(time.time() - t0, 1)}
            print("EVAL " + json.dumps(rec), flush=True)
            curve_f.write(json.dumps(rec) + "\n")
            curve_f.flush()
    print(f"trained {args.iters} iters in {time.time() - t0:.0f}s", flush=True)
    import numpy as _np
    save_npz(os.path.join(args.out, "e2e_params.npz"),
             jax.device_get(state.params))

    # network-level diagnostics on one val image
    ex = val.example(val.image_index[0])
    net = jax.jit(lambda p, im, ii: model.apply(p, im, ii))(
        jax.device_get(state.params), jnp.asarray(ex["image"]), jnp.asarray(ex["im_info"]))
    net = jax.device_get(net)
    print("netdiag: roi_valid=", int(net["roi_valid"].sum()),
          " cls_prob max per class=", _np.round(net["cls_prob"].max(0), 3).tolist(),
          " bg prob mean=", round(float(net["cls_prob"][:, 0].mean()), 3),
          " rois[:3]=", _np.round(net["rois"][:3], 1).tolist(), flush=True)

    r5, r7 = evaluate(state.params, verbose=True)
    rec = {"iter": args.iters, "map_r_050": round(r5["map"], 4),
           "map_r_070": round(r7["map"], 4),
           "total_loss": round(float(jax.device_get(last_metrics)["total"]), 4)
           if last_metrics is not None else None,
           "wall_s": round(time.time() - t0, 1)}
    curve_f.write(json.dumps(rec) + "\n")
    curve_f.close()
    final = {"map_r_050": round(r5["map"], 4),
             "map_r_070": round(r7["map"], 4),
             "iters": args.iters, "batch": args.batch}
    if args.int8_eval:
        # re-evaluate the SAME weights on the int8 MXU path (TEST.INT8
        # semantics) — the accuracy half of the quantization measurement
        import dataclasses

        from mnc_tpu.pipeline.inference import MNCPipeline as _P

        pipe_q = _P(MNC(arch=dataclasses.replace(arch, int8_inference=True)),
                    state.params, pipe.post)
        dets = []
        for i, ex in zip(val.image_index, val_ex):
            out = jax.device_get(pipe_q.detect_canvas_packed(
                jnp.asarray(ex["image"]), jnp.asarray(ex["im_info"])))
            out = unpack_canvas_masks(out, arch.canvas[1])
            dets.extend(collect_detections(out, i, score_thresh=0.05))
        q5 = eval_sds(dets, gt, val.num_classes, 0.5)
        q7 = eval_sds(dets, gt, val.num_classes, 0.7)
        final["int8_map_r_050"] = round(q5["map"], 4)
        final["int8_map_r_070"] = round(q7["map"], 4)
    print(json.dumps(final))


if __name__ == "__main__":
    main()
