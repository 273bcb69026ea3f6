#!/usr/bin/env python
"""Minimal serving loop: image paths in (stdin or args), JSON detections out.

The reference family had no serving story (single-shot scripts only —
SURVEY.md §1 note); this provides the production-shaped entry point: a warm
jitted pipeline, one line of JSON per image with boxes/classes/scores and
RLE-compressed masks (decode with ``mnc_tpu.native.rle_decode``).

    python tools/serve.py --ckpt output/run1 [--conf 0.7] [img1.jpg ...]
    # or stream paths on stdin, one per line

Throughput mode: add ``--set TEST.INT8 True`` — the int8 MXU path
(ops/quant.py) on the unchanged float weights.  Measured faster at every
batch (docs/results/int8_r5.jsonl) with per-stage quantization error
audited small (tools/int8_audit.py) and end-to-end mAP^r deltas whose
bootstrap CIs include zero (docs/results/ablation_r5.jsonl, 5stage_int8
row).  bf16 (the default) remains the reference-parity mode.
"""

import _init_paths  # noqa: F401
import argparse
import json
import sys


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("images", nargs="*")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--remap", nargs="*", default=None, metavar="OLD=NEW",
                    help="rename caffemodel layers before matching")
    ap.add_argument("--caffemodel", default=None,
                    help="reference .caffemodel weights (direct import; "
                         "run with --set NET.SUPPRESS_UNTRAINABLE_ANCHORS "
                         "False for foreign weights)")
    ap.add_argument("--npz", default=None)
    ap.add_argument("--exported", default=None, metavar="PATH",
                    help="serve a jax.export artifact (export_model.py "
                         "--stablehlo) — weights + program in one file, no "
                         "checkpoint/model build; excludes --http-batch and "
                         "canvas buckets (one fixed canvas per artifact)")
    ap.add_argument("--stages", type=int, default=5, choices=(3, 5))
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    ap.add_argument("--conf", type=float, default=0.7)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="serve over HTTP instead of the batch loop: "
                         "POST /detect (jpg/png or HWC uint8 .npy body), "
                         "GET /healthz")
    ap.add_argument("--http-batch", type=int, default=0, metavar="B",
                    help="micro-batch concurrent /detect requests up to B "
                         "per device call (detect_many; 0 = one at a time)")
    ap.add_argument("--http-wait-ms", type=float, default=10.0,
                    help="max coalescing wait for --http-batch")
    ap.add_argument("--prewarm", action="store_true",
                    help="compile every canvas variant (primary/transpose/"
                         "TEST.CANVAS_BUCKETS, + the batched program under "
                         "--http-batch) BEFORE accepting work; with the "
                         "persistent compile cache this also makes restarts "
                         "instant")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mnc_tpu.config import cfg_from_file, cfg_from_list

    if args.cfg:
        cfg_from_file(args.cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    from mnc_tpu import native
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg

    if args.exported:
        if args.http_batch:
            raise SystemExit("--exported serves the single-image artifact; "
                             "--http-batch needs the full pipeline")
        from mnc_tpu.pipeline.export import ExportedPipeline

        pipe = ExportedPipeline(args.exported)
        print(f"loaded exported program ({pipe.canvas} canvas) "
              f"from {args.exported}", flush=True)
        if args.prewarm:
            import time

            import numpy as _np

            t0 = time.perf_counter()
            pipe.detect(_np.zeros((*pipe.canvas, 3), _np.uint8))
            print(f"prewarmed exported program in "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
    else:
        pipe = None

    if pipe is None:
        arch = MNCArch.from_cfg(train=False, n_stages=args.stages)
        model = MNC(arch=arch)
        img0 = jnp.zeros((*arch.canvas, 3), jnp.float32)
        info0 = jnp.array([arch.canvas[0], arch.canvas[1], 1.0])
        params = jax.jit(model.init)(jax.random.PRNGKey(0), img0, info0)
        if args.caffemodel or args.npz:
            from mnc_tpu.utils.checkpoint import load_import_weights

            params, arch2 = load_import_weights(
                args.caffemodel, args.npz, arch, params, remap=args.remap,
                make_params=lambda a: jax.jit(MNC(arch=a).init)(
                    jax.random.PRNGKey(0), img0, info0))
            if arch2 is not arch:
                arch, model = arch2, MNC(arch=arch2)
        elif args.ckpt:
            from mnc_tpu.train.loop import TrainState
            from mnc_tpu.train.optim import make_optimizer
            from mnc_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint

            import os.path as osp

            path = args.ckpt
            if osp.isdir(path) and not osp.basename(path).startswith("ckpt_"):
                path = latest_checkpoint(path)
            tx = make_optimizer(params)
            params = restore_checkpoint(
                path, TrainState.create(params, tx)).params

        pipe = MNCPipeline(model, params, PostCfg.from_cfg(score_thresh=0.0))

        if args.prewarm:
            import time

            t0 = time.perf_counter()
            warmed = pipe.prewarm(batch_size=args.http_batch or None)
            print(f"prewarmed {len(warmed)} canvas variants "
                  f"{warmed} in {time.perf_counter() - t0:.1f}s", flush=True)

    def dets_to_json(dets) -> dict:
        instances = []
        for k in range(len(dets["scores"])):
            if not dets["valid"][k] or dets["scores"][k] < args.conf:
                continue
            rle = native.rle_encode(dets["full_masks"][k])
            instances.append({
                "box": [round(float(v), 1) for v in dets["boxes"][k]],
                "class_id": int(dets["classes"][k]),
                "score": round(float(dets["scores"][k]), 4),
                "mask_rle": {"size": list(rle["size"]),
                             "counts": rle["counts"].tolist()},
            })
        return {"instances": instances}

    def detect_to_json(im) -> dict:
        return dets_to_json(pipe.detect(im))

    if args.http is not None:
        from mnc_tpu.pipeline.server import make_http_server

        if args.http_batch:
            b = args.http_batch

            def batch_to_json(imgs):
                return [dets_to_json(d)
                        for d in pipe.detect_many(imgs, batch_size=b)]

            srv = make_http_server(batch_fn=batch_to_json, port=args.http,
                                   max_batch=b, max_wait_ms=args.http_wait_ms)
        else:
            srv = make_http_server(detect_to_json, port=args.http)
        print(f"serving on :{srv.server_address[1]} "
              "(POST /detect, GET /healthz)", flush=True)
        srv.serve_forever()
        return

    import cv2

    def handle(path: str):
        im = cv2.imread(path.strip())
        if im is None:
            print(json.dumps({"image": path, "error": "unreadable"}), flush=True)
            return
        print(json.dumps({"image": path, **detect_to_json(im)}), flush=True)

    sources = args.images if args.images else sys.stdin
    for line in sources:
        handle(line)


if __name__ == "__main__":
    main()
