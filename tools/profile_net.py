#!/usr/bin/env python
"""Profiling / per-stage timing — ≙ ``caffe time`` (caffe-mnc/tools/caffe.cpp).

Two modes:
- ``--trace DIR``: capture a jax.profiler trace (TensorBoard/Perfetto) of the
  full inference step.
- default: per-component steady-state timing (trunk / rpn / proposals+nms /
  warp / mask / classify / bridge / postprocess) using the chained-dispatch
  technique from bench.py (works on the remote-tunnel platform).

Params are passed explicitly to every jitted piece — closure capture would
embed ~0.5 GB of weights as constants in the remote-compile request.
"""

import _init_paths  # noqa: F401
import argparse
import os
import time


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="capture jax.profiler trace to DIR")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stages", type=int, default=5, choices=(3, 5))
    ap.add_argument("--mfu", action="store_true",
                    help="per-stage roofline: FLOPs + HBM bytes (XLA cost "
                         "analysis of each compiled piece), achieved TFLOP/s "
                         "and GB/s vs chip peaks, and the binding wall")
    ap.add_argument("--json", default=None,
                    help="also append per-stage records to this jsonl file")
    ap.add_argument("--set", dest="set_cfgs", nargs="*", default=None,
                    help="cfg overrides, e.g. --set NET.S2D_BLOCK1 True")
    ap.add_argument("--trunk-only", action="store_true",
                    help="time only the trunk piece (fast A/B of trunk "
                         "layout knobs like NET.S2D_BLOCK1 / TEST.INT8)")
    ap.add_argument("--trunk-layers", action="store_true",
                    help="per-layer trunk breakdown: time each op-prefix of "
                         "the VGG trunk (17 compiles) and report deltas + "
                         "per-layer roofline")
    ap.add_argument("--cpu", action="store_true")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.models.mnc import MNC, MNCArch, propose_rois, stage_bridge
    from mnc_tpu.pipeline.inference import PostCfg, postprocess_detections

    if args.set_cfgs:
        from mnc_tpu.config import cfg_from_list

        cfg_from_list(args.set_cfgs)

    arch = MNCArch.from_cfg(train=False, n_stages=args.stages)
    post = PostCfg.from_cfg(dets_per_class=16)
    model = MNC(arch=arch)
    anchors = jnp.asarray(arch.all_anchors())

    img0 = jnp.zeros((*arch.canvas, 3), jnp.float32)
    info0 = jnp.array([arch.canvas[0], arch.canvas[1], 1.0])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img0, info0)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randn(args.batch, *arch.canvas, 3).astype(np.float32) * 30)
    infos = jnp.tile(info0, (args.batch, 1))

    if args.trace:
        fn = jax.jit(jax.vmap(lambda p, x, i: model.apply(p, x, i),
                              in_axes=(None, 0, 0)))
        out = fn(params, images, infos)
        jax.block_until_ready(out)
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(fn(params, images, infos))
        print(f"trace written to {args.trace}")
        return

    from bench import _chip_peaks, _cost_analysis

    peak_flops, peak_bw, chip = _chip_peaks(jax.devices()[0])
    ridge = peak_flops / peak_bw
    if args.mfu:
        print(f"# chip={chip} peaks: {peak_flops / 1e12:.0f} TFLOP/s bf16, "
              f"{peak_bw / 1e9:.0f} GB/s HBM (ridge {ridge:.0f} FLOP/B)")

    records = []

    def piece(name, fn, p, *inputs):
        @jax.jit
        def step(carry, p, *ins):
            perturbed = [ins[0] + carry * 1e-20] + list(ins[1:])
            out = fn(p, *perturbed)
            s = sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(out))
            return carry + s * 1e-9

        zero = jnp.zeros((), jnp.float32)
        float(jax.device_get(step(zero, p, *inputs)))  # compile

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
        ms = (tn - t1) / args.iters * 1e3 / args.batch
        rec = {"stage": name, "ms_per_img": round(ms, 3), "batch": args.batch}
        line = f"{name:28s} {ms:8.3f} ms/img"
        if args.mfu:
            step_s = ms * 1e-3 * args.batch  # per-dispatch seconds
            flops, byts = _cost_analysis(
                step.lower(zero, p, *inputs).compile())
            intensity = flops / max(byts, 1.0)
            rec.update({
                "gflop_per_img": round(flops / args.batch / 1e9, 2),
                "hbm_gb_per_img": round(byts / args.batch / 1e9, 4),
                "achieved_tflops": round(flops / step_s / 1e12, 1),
                "mfu_pct": round(100 * flops / step_s / peak_flops, 1),
                "achieved_hbm_gbps": round(byts / step_s / 1e9, 1),
                "hbm_util_pct": round(100 * byts / step_s / peak_bw, 1),
                "bound": "compute" if intensity > ridge else "memory",
            })
            line += (f"  {rec['gflop_per_img']:9.1f} GF/img"
                     f" {rec['hbm_gb_per_img']:7.3f} GB/img"
                     f"  {rec['achieved_tflops']:6.1f} TF/s ({rec['mfu_pct']:4.1f}%)"
                     f"  {rec['achieved_hbm_gbps']:6.1f} GB/s ({rec['hbm_util_pct']:4.1f}%)"
                     f"  {rec['bound']}-bound")
        print(line, flush=True)
        records.append(rec)
        return ms

    def vm(f):
        return lambda p, *ins: jax.vmap(lambda *xs: f(p, *xs))(*ins)

    f_trunk = vm(lambda p, x: model.apply(p, x, method=MNC.features))
    f_rpn = vm(lambda p, f: model.apply(p, f, method=MNC.rpn))
    f_prop = vm(lambda p, c, b, i: propose_rois(c, b, i, anchors, arch))
    f_warp = vm(lambda p, f, r: model.apply(p, f, r, method=MNC.warp))
    f_mask = vm(lambda p, rf: model.apply(p, rf, method=MNC.mask_stage))
    f_cls = vm(lambda p, rf, ml: model.apply(p, rf, ml, method=MNC.classify_stage))
    f_bridge = vm(lambda p, r, c, b, i: stage_bridge(r, c, b, i, arch))
    f_post = vm(lambda p, r, v, c, m: postprocess_detections(
        r, v, c, m, post, arch.canvas))

    if args.trunk_layers:
        from mnc_tpu.models.vgg import _VGG16_BLOCKS, VGG16Trunk

        names = []
        for b, block in enumerate(_VGG16_BLOCKS):
            names += [n for n, _ in block]
            if b < 4:
                names.append(f"pool{b + 1}")
        tp = {"params": params["params"]["trunk"]}
        prev, rows = 0.0, []
        for k in range(1, len(names) + 1):
            tk = VGG16Trunk(prefix_ops=k)
            f = vm(lambda p, x, _tk=tk: _tk.apply(p, x))
            ms = piece(f"trunk[:{k:2d}] {names[k - 1]}", f, tp, images)
            rows.append((names[k - 1], ms - prev))
            prev = ms
        print("\nper-layer deltas (prefix differences):")
        for n, d in rows:
            print(f"  {n:10s} {d:7.3f} ms/img")
        if args.json:
            import json
            import os.path as osp

            os.makedirs(osp.dirname(args.json) or ".", exist_ok=True)
            with open(args.json, "a") as f:
                for (n, d), rec in zip(rows, records):
                    rec["layer_delta_ms"] = round(d, 3)
                    rec["layer"] = n
                    f.write(json.dumps(rec) + "\n")
        return

    if args.trunk_only:
        piece("trunk (conv)", f_trunk, params, images)
        if args.json:
            import json
            import os.path as osp

            os.makedirs(osp.dirname(args.json) or ".", exist_ok=True)
            with open(args.json, "a") as f:
                for rec in records:
                    rec["set"] = args.set_cfgs
                    f.write(json.dumps(rec) + "\n")
        return

    feats = jax.jit(f_trunk)(params, images)
    rpn_out = jax.jit(f_rpn)(params, feats)
    rois, valid, _ = jax.jit(f_prop)(params, rpn_out[0], rpn_out[1], infos)
    roi_feat = jax.jit(f_warp)(params, feats, rois)
    mask_logits = jax.jit(f_mask)(params, roi_feat)
    cls_bbox = jax.jit(f_cls)(params, roi_feat, mask_logits)

    total = 0.0
    total += piece("trunk (conv)", f_trunk, params, images)
    total += piece("rpn head", f_rpn, params, feats)
    total += piece("proposals + nms", f_prop, params, rpn_out[0], rpn_out[1], infos)
    total += piece("roi_warp", f_warp, params, feats, rois)
    total += piece("mask head", f_mask, params, roi_feat)
    total += piece("classify head (maskpool+fc)", f_cls, params, roi_feat, mask_logits)
    cls_prob = jax.nn.softmax(cls_bbox[0], axis=-1)
    total += piece("stage bridge", f_bridge, params, rois, cls_prob, cls_bbox[1], infos)
    total += piece("postprocess (nms+vote+paste)", f_post, params, rois, valid,
                   cls_prob, mask_logits)
    print(f"{'sum of pieces (3-stage-ish)':28s} {total:8.3f} ms/img")
    if args.json:
        import json
        import os.path as osp

        os.makedirs(osp.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        print(f"appended {len(records)} records to {args.json}")


if __name__ == "__main__":
    main()
