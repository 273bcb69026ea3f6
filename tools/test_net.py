#!/usr/bin/env python
"""Evaluate MNC — ≙ reference ``tools/test_net.py`` + TesterWrapper.

Runs the full detection pipeline over an imdb, caches raw detections, and
reports mAP^r @0.5/0.7 with the reference-style per-class AP table.

    python tools/test_net.py --imdb synthetic_16 [--ckpt PATH] [--stages 5]
        [--conf 0.0] [--cache out.pkl] [--cpu]
"""

import _init_paths  # noqa: F401
import argparse
import os
import os.path as osp
import pickle


def parse_args():
    ap = argparse.ArgumentParser(description="Test MNC")
    ap.add_argument("--imdb", default="synthetic_16")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--remap", nargs="*", default=None, metavar="OLD=NEW",
                    help="rename caffemodel layers before matching")
    ap.add_argument("--caffemodel", default=None,
                    help="reference .caffemodel weights (direct import; "
                         "run with --set NET.SUPPRESS_UNTRAINABLE_ANCHORS "
                         "False for foreign weights)")
    ap.add_argument("--npz", default=None)
    ap.add_argument("--coco-ap", action="store_true",
                    help="also report COCO-style AP^r@[.5:.95]")
    ap.add_argument("--segdb", default=None,
                    help="CFM mode: dir of per-image segment-proposal pkls "
                         "(tools/prepare_mcg_maskdb.py output); classifies "
                         "precomputed segments instead of running the RPN")
    ap.add_argument("--seg-top-k", type=int, default=300,
                    help="CFM: static per-image segment capacity (padded)")
    ap.add_argument("--eval-batch", type=int, default=1,
                    help="detect images in device batches of N "
                         "(synthetic imdbs; amortizes per-image dispatch)")
    ap.add_argument("--dp", action="store_true",
                    help="shard --eval-batch across ALL local devices "
                         "(data-parallel eval via shard_map; --eval-batch "
                         "must be a multiple of the device count)")
    ap.add_argument("--stages", type=int, default=5, choices=(3, 5))
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    ap.add_argument("--conf", type=float, default=0.0)
    ap.add_argument("--cache", default=None, help="pickle path for raw detections")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--task", default="seg", choices=("seg",))
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.config import cfg, cfg_from_file, cfg_from_list
    from mnc_tpu.data.eval_sds import collect_detections, print_ap_table
    from mnc_tpu.data.pascal_voc import get_imdb
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg
    from mnc_tpu.utils.timer import Timer

    if args.cfg:
        cfg_from_file(args.cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    imdb = get_imdb(args.imdb)
    is_synth = args.imdb.startswith("synthetic")
    arch_kw = dict(n_stages=args.stages)
    if is_synth:
        arch_kw.update(canvas=imdb.gen.canvas_hw, num_classes=imdb.num_classes,
                       anchor_scales=(2, 4, 8), rpn_min_size=4.0)
    arch = MNCArch.from_cfg(train=False, **arch_kw)
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
    elif args.ckpt:
        from mnc_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint

        path = args.ckpt
        if osp.isdir(path) and not osp.basename(path).startswith("ckpt_"):
            path = latest_checkpoint(path)
        # checkpoints store TrainState; restore and take the params leaf
        from mnc_tpu.train.loop import TrainState
        from mnc_tpu.train.optim import make_optimizer

        tx = make_optimizer(params)
        state = restore_checkpoint(path, TrainState.create(params, tx))
        params = state.params
        print(f"loaded {path}")
    else:
        print("WARNING: random weights (plumbing smoke)")

    post = PostCfg.from_cfg(score_thresh=args.conf)
    pipe = MNCPipeline(model, params, post)

    dp_run = dp_params = dp_shard = None
    if args.dp:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from mnc_tpu.parallel import (data_parallel_eval_step, make_mesh,
                                      replicate)

        mesh = make_mesh()
        ndev = mesh.devices.size
        if args.eval_batch % ndev:
            raise SystemExit(f"--dp: --eval-batch {args.eval_batch} must be a "
                             f"multiple of the {ndev} local devices")
        # per-image packed runner sharded over the mesh's data axis
        dp_run = data_parallel_eval_step(
            pipe._packed_variant(tuple(arch.canvas)), mesh)
        dp_params = replicate(params, mesh)
        dp_shard = NamedSharding(mesh, P("data"))
        print(f"--dp: eval batches of {args.eval_batch} sharded over "
              f"{ndev} devices")

    if args.segdb:
        from mnc_tpu.models.cfm import cfm_detect

        k = args.seg_top_k
        jit_cfm = jax.jit(lambda p, im, ii, b, m, v: cfm_detect(
            model, p, im, ii, b, m, v, post))

        def load_segs(image_id):
            path = osp.join(args.segdb, f"{image_id}.pkl")
            if not osp.exists(path):
                raise SystemExit(
                    f"--segdb: no segment proposals for image {image_id!r} "
                    f"({path} missing) — run tools/prepare_mcg_maskdb.py "
                    f"over the full image list first")
            with open(path, "rb") as f:
                rec = pickle.load(f)
            nseg = min(len(rec["boxes"]), k)
            boxes = np.zeros((k, 4), np.float32)
            masks = np.zeros((k, cfg.MASK_SIZE, cfg.MASK_SIZE), np.float32)
            valid = np.zeros((k,), bool)
            boxes[:nseg] = rec["boxes"][:nseg]
            src = rec["masks"][:nseg]
            if nseg and src.shape[-1] != cfg.MASK_SIZE:
                import cv2

                src = np.stack([cv2.resize(m, (cfg.MASK_SIZE, cfg.MASK_SIZE),
                                           interpolation=cv2.INTER_AREA)
                                for m in src])
            masks[:nseg] = src
            valid[:nseg] = True
            return boxes, masks, valid

    detections = []
    timer = Timer()
    pending = []

    def flush_batch():
        # pad the tail batch to the compiled batch size by repeating the last
        from mnc_tpu.pipeline.inference import unpack_canvas_masks

        if not pending:
            return
        b = args.eval_batch
        entries = pending[:]
        while len(entries) < b:
            entries.append(entries[-1])
        canvases = jnp.asarray(np.stack([e[1] for e in entries]))
        infos = jnp.asarray(np.stack([e[2] for e in entries]))
        timer.tic()
        if dp_run is not None:
            outs = jax.device_get(dp_run(
                dp_params, jax.device_put(canvases, dp_shard),
                jax.device_put(infos, dp_shard)))
        else:
            outs = jax.device_get(pipe.detect_canvas_batch_packed(canvases, infos))
        timer.toc()
        for k, (i, _, _, _) in enumerate(pending):
            out = {key: v[k] for key, v in outs.items()}
            out = unpack_canvas_masks(out, pipe.arch.canvas[1])
            detections.extend(collect_detections(out, i, args.conf))
        pending.clear()

    if args.cache and osp.exists(args.cache):
        with open(args.cache, "rb") as f:
            detections = pickle.load(f)
        print(f"loaded {len(detections)} cached detections from {args.cache}")
    else:
        for n, i in enumerate(imdb.image_index):
            if args.segdb:
                if is_synth:
                    ex = imdb.example(i)
                    canvas, info = ex["image"], ex["im_info"]
                else:
                    import cv2

                    from mnc_tpu.utils.blob import prep_im_for_blob

                    im = cv2.imread(imdb.image_path_at(n))
                    canvas, info = prep_im_for_blob(
                        im, target_size=cfg.TEST.SCALES[0],
                        max_size=cfg.TEST.MAX_SIZE,
                        canvas_hw=tuple(cfg.STATIC.CANVAS))
                boxes, masks, valid = load_segs(i)
                boxes = boxes * float(info[2])  # segdb is original-image coords
                timer.tic()
                out = jax.device_get(jit_cfm(
                    params, jnp.asarray(canvas), jnp.asarray(info),
                    jnp.asarray(boxes), jnp.asarray(masks), jnp.asarray(valid)))
                timer.toc()
                if not is_synth:  # unmold canvas masks to original resolution
                    from mnc_tpu.pipeline.inference import _resize_mask_to

                    h, w = im.shape[:2]
                    sh, sw = int(info[0]), int(info[1])
                    out["canvas_masks"] = np.stack([
                        _resize_mask_to(m[:sh, :sw], (h, w))
                        for m in out["canvas_masks"]]) if len(
                            out["canvas_masks"]) else out["canvas_masks"]
                    out["boxes"] = out["boxes"] / float(info[2])
                detections.extend(collect_detections(out, i, args.conf))
            elif is_synth:
                ex = imdb.example(i)
                canvas, info = ex["image"], ex["im_info"]
                if args.eval_batch > 1:
                    pending.append((i, canvas, info, None))
                    if len(pending) == args.eval_batch or n == imdb.num_images - 1:
                        flush_batch()
                    continue
                timer.tic()
                out = jax.device_get(pipe.detect_canvas(
                    jnp.asarray(canvas), jnp.asarray(info)))
                timer.toc()
                detections.extend(collect_detections(out, i, args.conf))
            else:
                import cv2

                im = cv2.imread(imdb.image_path_at(n))
                timer.tic()
                out = pipe.detect(im)
                timer.toc()
                out["canvas_masks"] = out["full_masks"]
                detections.extend(collect_detections(out, i, args.conf))
            if (n + 1) % 50 == 0:
                print(f"im_detect: {n + 1}/{imdb.num_images} "
                      f"{timer.average_time:.3f}s/im")
        if args.cache:
            os.makedirs(osp.dirname(args.cache) or ".", exist_ok=True)
            with open(args.cache, "wb") as f:
                pickle.dump(detections, f)

    threshs = (0.5, 0.7, "avg") if args.coco_ap else (0.5, 0.7)
    results = imdb.evaluate(detections, iou_threshs=threshs)
    for t, res in results.items():
        print(print_ap_table(res, imdb.classes))
    line = (f"mAP^r@0.5 = {results[0.5]['map']:.4f}  "
            f"mAP^r@0.7 = {results[0.7]['map']:.4f}")
    if args.coco_ap:
        line += f"  AP^r@[.5:.95] = {results['avg']['map']:.4f}"
    print(line)


if __name__ == "__main__":
    main()
