#!/usr/bin/env python
"""Per-component profile of the TRAIN step (VERDICT r3 item 5).

The 160 ms reference-budget training step (pre/post-NMS 12000/2000, batch 8)
had no committed breakdown — this measures it two ways:

1. **Forward pieces** (chained-dispatch timing, as profile_net.py):
   trunk / rpn / anchor_targets / propose+tiled-NMS / proposal_targets /
   per-RoI pass (warp+mask+classify) / bridge+reassign — per-image ms, and
   with ``--mfu`` the XLA-cost-analysis FLOPs + HBM bytes and achieved
   TFLOP/s / GB/s per piece.

2. **Whole-step attribution** (backward can't be timed piecewise): deltas
   between full-step variants —
     full(12000/2000, 5-stage)           the shipped budget
     loss-forward-only                   → bwd+update = full − fwd
     3-stage step                        → second cascade pass cost
     2048/512 budget                     → NMS working-set cost

    python tools/train_profile.py --batch 8 --json docs/results/train_profile_r4.jsonl
"""

import _init_paths  # noqa: F401
import argparse
import json
import os
import os.path as osp
import time


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mfu", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-variants", action="store_true",
                    help="only the forward pieces (faster; skips the three "
                         "extra whole-step compiles)")
    ap.add_argument("--canvas", type=int, nargs=2, default=None,
                    help="tiny-canvas smoke override (CPU)")
    ap.add_argument("--cpu", action="store_true")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import _chip_peaks, _cost_analysis
    from mnc_tpu.config import cfg
    from mnc_tpu.data.synthetic import SHAPE_NAMES, SyntheticShapes
    from mnc_tpu.models.mnc import MNC, MNCArch, propose_rois, stage_bridge
    from mnc_tpu.train import targets as T
    from mnc_tpu.train.loop import TrainState, build_train_step, make_train_step
    from mnc_tpu.train.optim import make_optimizer

    over = {}
    if args.canvas:
        over.update(canvas=tuple(args.canvas), anchor_scales=(2, 4, 8),
                    rpn_min_size=4.0, num_classes=4, fc_dim=64, mask_fc_dim=32,
                    mask_size=9, warp_hw=4)
    arch = MNCArch.from_cfg(train=True, n_stages=5, **over)
    model = MNC(arch=arch)
    train_cfg = {k: cfg.TRAIN[k] for k in (
        "RPN_POSITIVE_OVERLAP", "RPN_NEGATIVE_OVERLAP", "RPN_BATCHSIZE",
        "RPN_FG_FRACTION", "BATCH_SIZE", "FG_FRACTION", "FG_THRESH",
        "BG_THRESH_HI", "BG_THRESH_LO")}
    anchors = jnp.asarray(arch.all_anchors())

    data = SyntheticShapes(canvas_hw=arch.canvas,
                           num_classes=min(arch.num_classes,
                                           1 + len(SHAPE_NAMES)),
                           max_gt=min(int(cfg.STATIC.MAX_GT), 8),
                           gt_mask_size=28, n_range=(2, 5), seed=0)
    batch = {k: jnp.asarray(v) for k, v in data.batch(range(args.batch)).items()}

    img0 = jnp.zeros((*arch.canvas, 3), jnp.float32)
    info0 = jnp.array([arch.canvas[0], arch.canvas[1], 1.0])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img0, info0)
    tx = make_optimizer(params)
    key = jax.random.PRNGKey(0)

    peak_flops, peak_bw, chip = _chip_peaks(jax.devices()[0])
    print(f"# train profile: batch {args.batch}, canvas {arch.canvas}, "
          f"budget {arch.pre_nms_top_n}/{arch.post_nms_top_n}, chip {chip}")

    records = []

    def piece(name, fn, p, *inputs, per_img=True):
        """Chained-dispatch steady-state timing of one jitted piece.

        ``p`` (params / train state) is passed EXPLICITLY through jit —
        closure capture would embed ~0.6 GB of weights as constants in the
        remote-compile request (HTTP 413 on the tunnel; same rule as
        profile_net.py).
        """

        @jax.jit
        def step(carry, p_, *ins):
            perturbed = [ins[0] + carry * 1e-20] + list(ins[1:])
            out = fn(p_, *perturbed)
            s = sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(out))
            return carry + s * 1e-9

        zero = jnp.zeros((), jnp.float32)
        float(jax.device_get(step(zero, p, *inputs)))

        def timed(n):
            t0 = time.perf_counter()
            c = zero
            for _ in range(n):
                c = step(c, p, *inputs)
            float(jax.device_get(c))
            return time.perf_counter() - t0

        timed(1)
        t1 = min(timed(1) for _ in range(2))
        tn = min(timed(args.iters + 1) for _ in range(2))
        denom = args.batch if per_img else 1
        ms = (tn - t1) / args.iters * 1e3 / denom
        rec = {"stage": name, "ms_per_img": round(ms, 3), "batch": args.batch,
               "pre_nms": arch.pre_nms_top_n, "post_nms": arch.post_nms_top_n}
        line = f"{name:32s} {ms:8.3f} ms/img"
        if args.mfu:
            step_s = (tn - t1) / args.iters
            flops, byts = _cost_analysis(step.lower(zero, p, *inputs).compile())
            rec.update({
                "gflop_per_img": round(flops / args.batch / 1e9, 2),
                "hbm_gb_per_img": round(byts / args.batch / 1e9, 4),
                "achieved_tflops": round(flops / step_s / 1e12, 1),
                "mfu_pct": round(100 * flops / step_s / peak_flops, 1),
                "achieved_hbm_gbps": round(byts / step_s / 1e9, 1),
                "hbm_util_pct": round(100 * byts / step_s / peak_bw, 1),
            })
            line += (f"  {rec['gflop_per_img']:9.1f} GF/img"
                     f"  {rec['achieved_tflops']:6.1f} TF/s ({rec['mfu_pct']:4.1f}%)"
                     f"  {rec['achieved_hbm_gbps']:6.1f} GB/s ({rec['hbm_util_pct']:4.1f}%)")
        print(line, flush=True)
        records.append(rec)
        return ms

    # ---- forward pieces (vmapped over the image batch, like the real step)
    vb = jax.vmap

    def f_trunk(p, imgs):
        return vb(lambda x: model.apply(p, x, method=MNC.features))(imgs)

    feats = jax.jit(f_trunk)(params, batch["image"])

    def f_rpn(p, f):
        return vb(lambda x: model.apply(p, x, method=MNC.rpn))(f)

    rpn_cls, rpn_bbox = jax.jit(f_rpn)(params, feats)

    def f_atgt(p, rc):
        del rc  # timing convention: first arg is perturbed; targets need none
        return vb(lambda gb, gv, ii: T.anchor_targets(
            anchors, gb, gv, (ii[0], ii[1]), jax.random.PRNGKey(0),
            pos_overlap=train_cfg["RPN_POSITIVE_OVERLAP"],
            neg_overlap=train_cfg["RPN_NEGATIVE_OVERLAP"],
            batch_size=train_cfg["RPN_BATCHSIZE"],
            fg_fraction=train_cfg["RPN_FG_FRACTION"]))(
                batch["gt_boxes"], batch["gt_valid"], batch["im_info"])

    def f_prop(p, rc, rb, ii):
        return vb(lambda c, b, i: propose_rois(c, b, i, anchors, arch))(rc, rb, ii)

    rois, roi_valid, _ = jax.jit(f_prop)(None, rpn_cls, rpn_bbox, batch["im_info"])

    def f_ptgt(p, r, v):
        return vb(lambda r_, v_, gb, gc, gv, gm: T.proposal_targets(
            r_, v_, gb, gc, gv, gm, jax.random.PRNGKey(0),
            roi_batch=train_cfg["BATCH_SIZE"],
            fg_fraction=train_cfg["FG_FRACTION"],
            fg_thresh=train_cfg["FG_THRESH"],
            bg_thresh_hi=train_cfg["BG_THRESH_HI"],
            bg_thresh_lo=train_cfg["BG_THRESH_LO"], mask_size=arch.mask_size,
            bbox_means=arch.bbox_means, bbox_stds=arch.bbox_stds))(
                r, v, batch["gt_boxes"], batch["gt_classes"],
                batch["gt_valid"], batch["gt_masks"])

    tgt = jax.jit(f_ptgt)(None, rois, roi_valid)

    def f_roipass(p, f, r):
        def one(f_, r_):
            rf = model.apply(p, f_, r_, method=MNC.warp)
            ml = model.apply(p, rf, method=MNC.mask_stage)
            return model.apply(p, rf, ml, method=MNC.classify_stage)

        return vb(one)(f, r)

    cls_logits, bbox_pred = jax.jit(f_roipass)(params, feats, tgt.rois)

    def f_bridge(p, cl, bp):
        cp = jax.nn.softmax(cl, axis=-1)
        r2 = vb(lambda r_, c_, b_, i_: stage_bridge(
            r_, c_, b_, i_, arch, bbox_pred_normalized=True))(
                tgt.rois, cp, bp, batch["im_info"])
        return vb(lambda r_, l_, gb, gc, gv, gm: T.reassign_targets(
            r_, l_, gb, gc, gv, gm, fg_thresh=train_cfg["FG_THRESH"],
            mask_size=arch.mask_size, bbox_means=arch.bbox_means,
            bbox_stds=arch.bbox_stds))(
                r2, tgt.labels, batch["gt_boxes"], batch["gt_classes"],
                batch["gt_valid"], batch["gt_masks"])

    fwd_total = 0.0
    fwd_total += piece("trunk fwd", f_trunk, params, batch["image"])
    fwd_total += piece("rpn head fwd", f_rpn, params, feats)
    fwd_total += piece("anchor_targets", f_atgt, None, rpn_cls)
    fwd_total += piece("propose (tiled NMS)", f_prop, None, rpn_cls, rpn_bbox,
                       batch["im_info"])
    fwd_total += piece("proposal_targets", f_ptgt, None, rois, roi_valid)
    fwd_total += piece("roi pass fwd (warp+mask+cls)", f_roipass, params,
                       feats, tgt.rois)
    fwd_total += piece("bridge + reassign_targets", f_bridge, None,
                       cls_logits, bbox_pred)
    print(f"{'sum fwd pieces (1 roi pass)':32s} {fwd_total:8.3f} ms/img")

    # ---- whole-step attribution
    step_unjit = build_train_step(model, tx, arch, train_cfg)
    state0 = TrainState.create(params, tx)

    def f_full(st, imgs):
        b2 = dict(batch, image=imgs)
        s2, m = step_unjit(st, b2, key)
        # Return the UPDATED PARAMS too — returning only the loss lets XLA
        # dead-code-eliminate the entire backward+update (caught r4: "bwd"
        # then measures 0.18 ms/img, impossibly small).  The timing loop's
        # consume-sum of the returned tree adds a ~0.6 GB param read
        # (~0.09 ms/img at batch 8) — accepted, noted in STATUS.
        return s2.params, m["total"]

    def f_lossfwd(p, imgs):
        b2 = dict(batch, image=imgs)
        import mnc_tpu.train.loop as L

        def lf(bt, k):
            return L.mnc_loss(p, model, bt, k, arch, anchors, train_cfg)[0]

        return jnp.mean(vb(lf)(b2, jax.random.split(key, args.batch)))

    full_ms = piece("FULL train step (fwd+bwd+sgd)", f_full, state0,
                    batch["image"])
    if not args.skip_variants:
        fwd_ms = piece("loss forward only", f_lossfwd, params, batch["image"])
        arch3 = MNCArch.from_cfg(train=True, n_stages=3, **over)
        step3 = build_train_step(MNC(arch=arch3), tx, arch3, train_cfg)

        def f_full3(st, imgs):
            s2, m = step3(st, dict(batch, image=imgs), key)
            return s2.params, m["total"]

        ms3 = piece("full step, 3-stage", f_full3, state0, batch["image"])
        small = dict(pre_nms_top_n=2048, post_nms_top_n=512)
        arch_s = MNCArch.from_cfg(train=True, n_stages=5, **{**over, **small})
        step_s = build_train_step(MNC(arch=arch_s), tx, arch_s, train_cfg)

        def f_full_small(st, imgs):
            s2, m = step_s(st, dict(batch, image=imgs), key)
            return s2.params, m["total"]

        ms_small = piece("full step, 2048/512 budget", f_full_small, state0,
                         batch["image"])
        print(f"\nattribution (ms/img of the {full_ms:.1f} full step):")
        print(f"  backward+update      {full_ms - fwd_ms:8.3f}  (full − loss-fwd)")
        print(f"  second cascade pass  {full_ms - ms3:8.3f}  (full − 3-stage)")
        print(f"  12000/2000 NMS cost  {full_ms - ms_small:8.3f}  (full − 2048/512)")
        records.append({"stage": "attribution",
                        "bwd_update_ms": round(full_ms - fwd_ms, 3),
                        "second_pass_ms": round(full_ms - ms3, 3),
                        "nms_budget_ms": round(full_ms - ms_small, 3),
                        "batch": args.batch})

    if args.json:
        os.makedirs(osp.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        print(f"appended {len(records)} records to {args.json}")


if __name__ == "__main__":
    main()
