#!/usr/bin/env python
"""MNC demo — ≙ reference ``tools/demo.py``.

Loads a 5-stage model and runs instance segmentation over the images in
``--im-dir`` (default data/demo), writing color-overlay outputs.  Without a
checkpoint it falls back to random weights (pipeline smoke); with
``--synthetic`` it renders+detects synthetic shapes instead of reading files.

Usage:
    python tools/demo.py [--ckpt PATH | --npz PATH] [--im-dir data/demo]
                         [--out data/demo/out] [--conf 0.7] [--cpu]
"""

import _init_paths  # noqa: F401
import argparse
import glob
import os
import os.path as osp


def parse_args():
    ap = argparse.ArgumentParser(description="MNC demo")
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir/path")
    ap.add_argument("--remap", nargs="*", default=None, metavar="OLD=NEW",
                    help="rename caffemodel layers before matching")
    ap.add_argument("--caffemodel", default=None,
                    help="reference .caffemodel weights (direct import; "
                         "run with --set NET.SUPPRESS_UNTRAINABLE_ANCHORS "
                         "False for foreign weights)")
    ap.add_argument("--npz", default=None, help="npz params export")
    ap.add_argument("--im-dir", default="data/demo")
    ap.add_argument("--out", default="data/demo/out")
    ap.add_argument("--conf", type=float, default=None)
    ap.add_argument("--stages", type=int, default=5, choices=(3, 5))
    ap.add_argument("--cfg", default=None, help="YAML config override")
    ap.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.config import cfg, cfg_from_file, cfg_from_list
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg
    from mnc_tpu.utils.vis import vis_seg
    from mnc_tpu.data.pascal_voc import VOC_CLASSES

    if args.cfg:
        cfg_from_file(args.cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    arch = MNCArch.from_cfg(train=False, n_stages=args.stages)
    model = MNC(arch=arch)
    img0 = jnp.zeros((*arch.canvas, 3), jnp.float32)
    info0 = jnp.array([arch.canvas[0], arch.canvas[1], 1.0])
    params = model.init(jax.random.PRNGKey(0), img0, info0)

    if args.caffemodel or args.npz:
        from mnc_tpu.utils.checkpoint import load_import_weights

        params, arch2 = load_import_weights(
            args.caffemodel, args.npz, arch, params, remap=args.remap,
            make_params=lambda a: MNC(arch=a).init(
                jax.random.PRNGKey(0), img0, info0))
        if arch2 is not arch:
            arch, model = arch2, MNC(arch=arch2)
        print(f"loaded params from {args.caffemodel or args.npz}")
    elif args.ckpt:
        from mnc_tpu.utils.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.ckpt, params)
        print(f"loaded params from {args.ckpt}")
    else:
        print("WARNING: no checkpoint given — random weights (smoke run)")

    conf = args.conf if args.conf is not None else cfg.TEST.CONF_THRESH
    pipe = MNCPipeline(model, params, PostCfg.from_cfg(score_thresh=0.0))

    os.makedirs(args.out, exist_ok=True)

    if args.synthetic:
        from mnc_tpu.data.synth_imdb import SyntheticIMDB

        imdb = SyntheticIMDB(canvas_hw=arch.canvas, num_images=4)
        for i in imdb.image_index:
            ex = imdb.example(i)
            dets = jax.device_get(pipe.detect_canvas(
                jnp.asarray(ex["image"]), jnp.asarray(ex["im_info"])))
            dets["full_masks"] = dets.pop("canvas_masks").astype(np.uint8)
            img_vis = np.clip(ex["image"] + 127, 0, 255).astype(np.uint8)
            out = vis_seg(img_vis, dets, imdb.classes, score_thresh=conf)
            path = osp.join(args.out, f"synthetic_{i}.png")
            _imwrite(path, out)
            kept = int((dets["valid"] & (dets["scores"] >= conf)).sum())
            print(f"synthetic_{i}: {kept} detections ≥ {conf} → {path}")
        return

    images = sorted(sum((glob.glob(osp.join(args.im_dir, p))
                         for p in ("*.jpg", "*.png", "*.jpeg")), []))
    if not images:
        print(f"no images found in {args.im_dir}")
        return
    import cv2

    from mnc_tpu.utils.timer import Timer

    timer = Timer()
    for path in images:
        im = cv2.imread(path)
        timer.tic()
        dets = pipe.detect(im)
        t = timer.toc(average=False)
        out = vis_seg(im, dets, VOC_CLASSES, score_thresh=conf)
        out_path = osp.join(args.out, osp.basename(path))
        cv2.imwrite(out_path, out)
        kept = int((dets["valid"] & (dets["scores"] >= conf)).sum())
        print(f"{osp.basename(path)}: detect {t:.3f}s, {kept} instances → {out_path}")


def _imwrite(path, img):
    try:
        import cv2

        cv2.imwrite(path, img)
    except ImportError:
        from PIL import Image

        Image.fromarray(img[..., ::-1]).save(path)


if __name__ == "__main__":
    main()
