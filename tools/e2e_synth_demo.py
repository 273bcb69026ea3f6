#!/usr/bin/env python
"""Self-contained end-to-end demonstration: train → detect → mAP^r.

Small-config version of experiments/scripts/mnc_synthetic.sh that runs on any
backend in minutes: trains the 5-stage cascade on synthetic shapes, then
evaluates mAP^r@0.5/0.7 with the full jitted detect pipeline.  Prints the
reference-style AP table and a final JSON line.

    python tools/e2e_synth_demo.py [--iters 300] [--cpu] [--eval-images 8]
"""

import _init_paths  # noqa: F401
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--eval-images", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--seed", type=int, default=0)
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
    imdb = SyntheticIMDB(canvas_hw=arch.canvas, num_classes=arch.num_classes,
                         max_gt=4, gt_mask_size=24, num_images=64, seed=1)
    val = SyntheticIMDB(canvas_hw=arch.canvas, num_classes=arch.num_classes,
                        max_gt=4, gt_mask_size=24, num_images=args.eval_images,
                        seed=99)

    model = MNC(arch=arch)
    ex0 = imdb.example(0)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.asarray(ex0["image"]), jnp.asarray(ex0["im_info"]))
    tx = make_optimizer(params, base_lr=args.lr, stepsize=max(args.iters * 3 // 4, 1),
                        clip_gradients=10.0)
    step = make_train_step(model, tx, arch, train_cfg)
    state = TrainState.create(params, tx)
    key = jax.random.PRNGKey(args.seed)

    t0 = time.time()
    for it in range(args.iters):
        ex = imdb.example(it % imdb.num_images)
        batch = {k: jnp.asarray(v) for k, v in ex.items()}
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        if (it + 1) % 50 == 0 or it == 0:
            m = jax.device_get(metrics)
            print(f"iter {it + 1}: total={float(m['total']):.3f} "
                  f"mask={float(m['s23_mask']):.3f} cls={float(m['s23_cls']):.3f}",
                  flush=True)
    print(f"trained {args.iters} iters in {time.time() - t0:.0f}s", flush=True)
    import numpy as _np
    from mnc_tpu.utils.checkpoint import save_npz
    save_npz("output/e2e_params.npz", jax.device_get(state.params))

    # network-level diagnostics on one val image
    ex = val.example(val.image_index[0])
    net = jax.jit(lambda p, im, ii: model.apply(p, im, ii))(
        jax.device_get(state.params), jnp.asarray(ex["image"]), jnp.asarray(ex["im_info"]))
    net = jax.device_get(net)
    print("netdiag: roi_valid=", int(net["roi_valid"].sum()),
          " cls_prob max per class=", _np.round(net["cls_prob"].max(0), 3).tolist(),
          " bg prob mean=", round(float(net["cls_prob"][:, 0].mean()), 3),
          " rois[:3]=", _np.round(net["rois"][:3], 1).tolist(), flush=True)

    pipe = MNCPipeline(model, jax.device_get(state.params),
                       PostCfg(dets_per_class=8, max_per_image=12, vote_top_k=24,
                               score_thresh=0.01))
    dets = []
    for i in val.image_index:
        ex = val.example(i)
        out = jax.device_get(pipe.detect_canvas(jnp.asarray(ex["image"]),
                                                jnp.asarray(ex["im_info"])))
        dets.extend(collect_detections(out, i, score_thresh=0.05))
        if i == val.image_index[0]:
            v = out["valid"]
            print("diag img0: n_det=", int(v.sum()),
                  " top scores=", np.round(out["scores"][:5], 3).tolist(),
                  " classes=", out["classes"][:5].tolist(),
                  " gt classes=", ex["gt_classes"][ex["gt_valid"]].tolist(),
                  " mask px=", [int(m.sum()) for m in out["canvas_masks"][:3]],
                  flush=True)
    gt = val.gt_instances()
    r5 = eval_sds(dets, gt, val.num_classes, 0.5)
    r7 = eval_sds(dets, gt, val.num_classes, 0.7)
    print(print_ap_table(r5, val.classes), flush=True)
    print(print_ap_table(r7, val.classes), flush=True)
    print(json.dumps({"map_r_050": round(r5["map"], 4),
                      "map_r_070": round(r7["map"], 4),
                      "iters": args.iters}))


if __name__ == "__main__":
    main()
