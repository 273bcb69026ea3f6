#!/usr/bin/env python
"""Realistic-stream inference benchmark (round-2 verdict, next-round item 5).

The headline bench (bench.py) measures the fixed-canvas batched device
pipeline with host prep excluded.  The reference's 2.8 img/s was a REAL
image-stream number — mixed sizes, host prep included — so this tool
measures the same thing for us: the full ``MNCPipeline.detect`` host API
over a synthetic mixed-size, mixed-orientation image stream shaped like VOC
(500×375, 375×500, 500×333, 480×640, …), with a realistic
``TEST.CANVAS_BUCKETS`` set:

    python tools/stream_bench.py --images 64 --append docs/results/stream_r3.jsonl

Reports:
  - compile_s / n_variants: one-time per-canvas-variant compile cost
  - img_per_sec: steady-state wall-clock throughput INCLUDING host resize,
    device transfer (bit-packed by default), and full-resolution unmold
  - img_per_sec_unpacked: same with packed transfer off (transfer-bound
    over the tunnel; closer to a co-located host either way)
"""

import _init_paths  # noqa: F401
import argparse
import json
import time

# VOC-shaped (H, W) source sizes: 4:3 / 3:2 landscape + portrait mixes.
VOC_SIZES = [
    (375, 500), (500, 375), (333, 500), (500, 333),
    (480, 640), (640, 480), (364, 480), (375, 500),
]
# Buckets sized so every VOC aspect ratio runs at the exact reference scale
# (shorter side 600, cap 1000): 4:3 → 600×800 fits (608, 816); 3:2 →
# 600×900 fits (608, 912).  Portraits use the transposed variants.
DEFAULT_BUCKETS = "((608,816),(608,912))"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default=None,
                    help="npz params (default: random init — timing only)")
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--buckets", default=DEFAULT_BUCKETS)
    ap.add_argument("--no-buckets", action="store_true",
                    help="single full canvas (+portrait) only")
    ap.add_argument("--unpacked-too", action="store_true",
                    help="also measure with packed transfer off")
    ap.add_argument("--batch", type=int, default=0,
                    help="also measure detect_many at this batch size "
                         "(canvas-grouped micro-batching; 0 = skip)")
    ap.add_argument("--batched-only", action="store_true",
                    help="skip the single-image passes (run the batched "
                         "measurement in its own process: a full sweep "
                         "leaves ~10 resident executables and the batched "
                         "compile on top can crash the TPU worker)")
    ap.add_argument("--append", default=None)
    ap.add_argument("--shapes", action="store_true",
                    help="synthetic shape SCENES instead of noise — with a "
                         "trained --params checkpoint this produces a "
                         "realistic per-image detection load (noise into a "
                         "trained model yields ~0 valid dets → the host "
                         "unmold cost is understated; noise into random "
                         "weights yields ~all-valid dets → overstated)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny arch on CPU (plumbing check)")
    ap.add_argument("--set", dest="set_cfgs", nargs="*", default=None,
                    help="cfg overrides, e.g. --set NET.NUM_CLASSES 6 "
                         "(must match --params checkpoint shapes)")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.config import cfg, cfg_from_list
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg

    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    if not args.no_buckets:
        cfg_from_list(["TEST.CANVAS_BUCKETS", args.buckets])

    if args.smoke:
        arch = MNCArch(
            canvas=(96, 128), anchor_scales=(2, 4, 8), num_classes=4,
            mask_size=9, warp_hw=4, n_stages=5, fc_dim=48, mask_fc_dim=24,
            pre_nms_top_n=64, post_nms_top_n=16, rpn_min_size=4.0,
            compute_dtype=jnp.float32,
        )
        cfg_from_list(["TEST.CANVAS_BUCKETS", "((48,64),)",
                       "TEST.SCALES", "(40,)", "TEST.MAX_SIZE", "64"])
        sizes = [(40, 56), (56, 40), (48, 64), (33, 50)]
        args.images = min(args.images, 8)
    else:
        arch = MNCArch.from_cfg(train=False)
        sizes = VOC_SIZES

    model = MNC(arch=arch)
    if args.params:
        from mnc_tpu.utils.checkpoint import load_npz

        params = load_npz(args.params)
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((*arch.canvas, 3), jnp.float32),
            jnp.array([arch.canvas[0], arch.canvas[1], 1.0], jnp.float32))
    pipe = MNCPipeline(model, params, PostCfg.from_cfg(score_thresh=0.01))

    rs = np.random.RandomState(0)
    stream = []
    if args.shapes:
        from mnc_tpu.data.synthetic import SyntheticShapes

        means = np.asarray(cfg.PIXEL_MEANS, np.float32).reshape(1, 1, 3)
        for i in range(args.images):
            h, w = sizes[i % len(sizes)]
            gen = SyntheticShapes(canvas_hw=(h, w), num_classes=arch.num_classes,
                                  n_range=(2, 5), seed=1000 + i, num_images=1)
            # generator images are mean-subtracted floats; add the means back
            # so the detect() host prep round-trips to the training stats
            stream.append(np.clip(gen.example(0)["image"] + means, 0, 255)
                          .astype(np.uint8))
    else:
        for i in range(args.images):
            h, w = sizes[i % len(sizes)]
            stream.append((rs.rand(h, w, 3) * 255).astype(np.uint8))

    n_det = []
    # transfer-mode tags so appended jsonl records are self-describing
    mode_tags = {"u8": bool(cfg.TEST.U8_TRANSFER),
                 "host_paste": bool(cfg.TEST.HOST_PASTE),
                 "load": "shapes" if args.shapes else "noise"}

    def run_pass(packed):
        n_det.clear()
        t0 = time.perf_counter()
        for im in stream:
            d = pipe.detect(im, packed=packed)
            n_det.append(int((d["valid"] & (d["scores"] >= 0.5)).sum()))
        return time.perf_counter() - t0

    recs = []
    if not args.batched_only:
        # pass 1: compile every variant the stream touches (timed separately)
        t0 = time.perf_counter()
        run_pass(packed=True)
        compile_pass_s = time.perf_counter() - t0
        n_variants = len(pipe._variants)

        t_steady = min(run_pass(packed=True) for _ in range(2))
        rec = {
            "metric": "stream_inference_img_per_sec",
            "value": round(args.images / t_steady, 2),
            "unit": "img/s",
            "vs_baseline": round(args.images / t_steady / 2.8, 2),
            "n_images": args.images,
            "n_canvas_variants": n_variants,
            "first_pass_s": round(compile_pass_s, 1),
            "buckets": "none" if args.no_buckets else args.buckets,
            "mean_dets_ge50": round(float(np.mean(n_det)), 1) if n_det else 0.0,
            **mode_tags,
        }
        print(json.dumps(rec), flush=True)
        recs = [rec]
    else:
        rec = {
            "unit": "img/s",
            "n_images": args.images,
            "buckets": "none" if args.no_buckets else args.buckets,
            **mode_tags,
        }
    if args.unpacked_too and not args.batched_only:
        run_pass(packed=False)  # compile packless postfetch variants
        t_unpacked = min(run_pass(packed=False) for _ in range(2))
        rec2 = dict(rec, metric="stream_inference_img_per_sec_unpacked",
                    value=round(args.images / t_unpacked, 2),
                    vs_baseline=round(args.images / t_unpacked / 2.8, 2))
        del rec2["first_pass_s"]
        print(json.dumps(rec2), flush=True)
        recs.append(rec2)
    if args.batch:
        def run_batched():
            n_det.clear()
            t0 = time.perf_counter()
            outs = pipe.detect_many(stream, batch_size=args.batch, packed=True)
            dt = time.perf_counter() - t0
            n_det.extend(int((d["valid"] & (d["scores"] >= 0.5)).sum())
                         for d in outs)
            return dt

        t0 = time.perf_counter()
        run_batched()  # compile the per-(canvas, batch) programs
        batch_compile_s = time.perf_counter() - t0
        t_batched = min(run_batched() for _ in range(2))
        rec3 = dict(rec, metric="stream_inference_img_per_sec_batched",
                    value=round(args.images / t_batched, 2),
                    vs_baseline=round(args.images / t_batched / 2.8, 2),
                    batch=args.batch,
                    mean_dets_ge50=round(float(np.mean(n_det)), 1),
                    first_pass_s=round(batch_compile_s, 1))
        print(json.dumps(rec3), flush=True)
        recs.append(rec3)
    if args.append:
        with open(args.append, "a") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
