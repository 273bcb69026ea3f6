#!/usr/bin/env python
"""Train MNC — ≙ reference ``tools/train_net.py`` + SolverWrapper loop.

    python tools/train_net.py --imdb synthetic_64 --iters 1000 \
        [--cfg experiments/cfgs/x.yml] [--set KEY VAL ...] \
        [--weights vgg16.npz|torchvision.pth] [--out output/run1] \
        [--dp] [--ims-per-batch N] [--cpu]

Snapshots (orbax) every TRAIN.SNAPSHOT_ITERS with auto-resume-from-latest;
JSONL metrics + the reference-style console loss line every 20 iters.
"""

import _init_paths  # noqa: F401
import argparse
import os.path as osp


def parse_args():
    ap = argparse.ArgumentParser(description="Train MNC")
    ap.add_argument("--imdb", default="synthetic_64")
    ap.add_argument("--iters", type=int, default=None, help="max iterations")
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    ap.add_argument("--weights", default=None, help="pretrained trunk (npz/pth)")
    ap.add_argument("--out", default=None, help="output dir (default from cfg)")
    ap.add_argument("--ims-per-batch", type=int, default=None)
    ap.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gt-mask-size", type=int, default=28)
    ap.add_argument("--segdb", default=None,
                    help="CFM training mode: dir of per-image segment-proposal "
                         "pkls (tools/prepare_mcg_maskdb.py). Trains trunk + "
                         "classify head on precomputed segments — no RPN / "
                         "mask-head losses (SURVEY §3.5)")
    ap.add_argument("--seg-top-k", type=int, default=64,
                    help="--segdb: segment proposals kept per image (padded)")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mnc_tpu.config import cfg, cfg_from_file, cfg_from_list, get_output_dir
    from mnc_tpu.data.loader import TrainLoader
    from mnc_tpu.data.pascal_voc import get_imdb
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.train.loop import TrainState, make_train_step
    from mnc_tpu.train.optim import make_optimizer, step_lr
    from mnc_tpu.utils.checkpoint import restore_latest, save_checkpoint
    from mnc_tpu.utils.metrics import MetricsLogger
    from mnc_tpu.utils.timer import Timer

    if args.cfg:
        cfg_from_file(args.cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    seed = args.seed if args.seed is not None else cfg.RNG_SEED
    np.random.seed(seed)

    imdb = get_imdb(args.imdb)
    is_synth = args.imdb.startswith("synthetic")
    canvas = imdb.gen.canvas_hw if is_synth else tuple(cfg.STATIC.CANVAS)
    num_classes = imdb.num_classes

    arch_kw = {}
    if is_synth:  # shrink static shapes to the synthetic canvas
        arch_kw = dict(canvas=canvas, num_classes=num_classes,
                       anchor_scales=(2, 4, 8), rpn_min_size=4.0)
    if (args.weights and cfg.NET.TRUNK.startswith("resnet")
            and not args.weights.endswith((".npz", ".caffemodel"))
            and not cfg.NET.RESNET_STRIDE_IN_3X3):
        # torchvision resnets are v1.5 (stride on the 3x3); importing them
        # into v1 geometry matches every shape but computes features the
        # weights were never trained for.  Auto-enable for a fresh model.
        print("torchvision ResNet weights: enabling NET.RESNET_STRIDE_IN_3X3 "
              "(v1.5 geometry the checkpoint was trained with)")
        cfg.NET.RESNET_STRIDE_IN_3X3 = True
    arch = MNCArch.from_cfg(train=True, **arch_kw)
    frac = arch.anchor_inside_fraction()
    if frac < 0.3:
        print(f"WARNING: only {frac:.0%} of anchors fit the canvas "
              f"{arch.canvas} — shrink NET.ANCHOR_SCALES or proposals will "
              f"be dominated by untrained out-of-image anchors at test time")
    model = MNC(arch=arch)

    train_cfg = dict(
        RPN_POSITIVE_OVERLAP=cfg.TRAIN.RPN_POSITIVE_OVERLAP,
        RPN_NEGATIVE_OVERLAP=cfg.TRAIN.RPN_NEGATIVE_OVERLAP,
        RPN_BATCHSIZE=cfg.TRAIN.RPN_BATCHSIZE,
        RPN_FG_FRACTION=cfg.TRAIN.RPN_FG_FRACTION,
        BATCH_SIZE=cfg.TRAIN.BATCH_SIZE,
        FG_FRACTION=cfg.TRAIN.FG_FRACTION,
        FG_THRESH=cfg.TRAIN.FG_THRESH,
        BG_THRESH_HI=cfg.TRAIN.BG_THRESH_HI,
        BG_THRESH_LO=cfg.TRAIN.BG_THRESH_LO,
        BBOX_REG=cfg.TRAIN.BBOX_REG,
        RPN_CLOBBER_POSITIVES=cfg.TRAIN.RPN_CLOBBER_POSITIVES,
        RPN_POSITIVE_WEIGHT=cfg.TRAIN.RPN_POSITIVE_WEIGHT,
        RPN_BBOX_INSIDE_WEIGHTS=tuple(cfg.TRAIN.RPN_BBOX_INSIDE_WEIGHTS),
        BBOX_INSIDE_WEIGHTS=tuple(cfg.TRAIN.BBOX_INSIDE_WEIGHTS),
    )

    img0 = jnp.zeros((*arch.canvas, 3), jnp.float32)
    info0 = jnp.array([arch.canvas[0], arch.canvas[1], 1.0])
    params = model.init(jax.random.PRNGKey(seed), img0, info0)

    if args.weights:
        if args.weights.endswith(".npz"):
            from mnc_tpu.utils.weights import load_vgg16_caffe_npz

            params = load_vgg16_caffe_npz(args.weights, params)
        elif args.weights.endswith(".caffemodel"):
            from mnc_tpu.utils.caffemodel import load_mnc_caffemodel
            from mnc_tpu.utils.checkpoint import renormalize_bbox_pred

            params = load_mnc_caffemodel(args.weights, params)
            # reference snapshots store bbox_pred with target stats folded in
            # (raw-delta outputs); training regresses normalized deltas, so
            # pull the stats back out before fine-tuning (ADVICE r2).
            params = renormalize_bbox_pred(params, arch.bbox_means,
                                           arch.bbox_stds)
            print("caffemodel bbox_pred re-normalized for training "
                  f"(stds {arch.bbox_stds})")
        elif arch.trunk.startswith("resnet"):
            from mnc_tpu.utils.weights import load_resnet_torchvision

            params = load_resnet_torchvision(params, weights_path=args.weights,
                                             depth=int(arch.trunk[6:]))
        else:
            from mnc_tpu.utils.weights import load_vgg16_torchvision

            params = load_vgg16_torchvision(params, weights_path=args.weights)
        print(f"initialized trunk from {args.weights}")

    tx = make_optimizer(
        params,
        base_lr=cfg.TRAIN.LEARNING_RATE,
        momentum=cfg.TRAIN.MOMENTUM,
        weight_decay=cfg.TRAIN.WEIGHT_DECAY,
        gamma=cfg.TRAIN.GAMMA,
        stepsize=cfg.TRAIN.STEPSIZE,
        iter_size=cfg.TRAIN.ITER_SIZE,
        clip_gradients=cfg.TRAIN.CLIP_GRADIENTS,
    )
    schedule = step_lr(cfg.TRAIN.LEARNING_RATE, cfg.TRAIN.GAMMA, cfg.TRAIN.STEPSIZE)

    out_dir = args.out or get_output_dir(imdb.name, f"mnc_{arch.n_stages}stage")
    state, start = restore_latest(out_dir, TrainState.create(params, tx))
    if start:
        print(f"resumed from iter {start}")

    ims_per_batch = args.ims_per_batch or cfg.TRAIN.IMS_PER_BATCH
    n_dev = len(jax.devices())
    if args.segdb and args.dp:
        raise SystemExit("--segdb (CFM training) does not support --dp yet")
    if args.dp and n_dev > 1:
        from mnc_tpu.parallel import (
            data_parallel_train_step, make_mesh, replicate, shard_batch)

        mesh = make_mesh()
        assert ims_per_batch % n_dev == 0 or ims_per_batch == 1, \
            "--ims-per-batch must be divisible by device count for --dp"
        if ims_per_batch < n_dev:
            ims_per_batch = n_dev
        step_fn = data_parallel_train_step(model, tx, arch, train_cfg, mesh)
        state = replicate(state, mesh)
        to_device = lambda b: shard_batch(b, mesh)  # noqa: E731
        print(f"data parallel over {n_dev} devices, batch {ims_per_batch}")
    elif args.segdb:
        from mnc_tpu.models.cfm import make_cfm_train_step

        step_fn = make_cfm_train_step(model, tx, arch, train_cfg)
        to_device = lambda b: jax.tree.map(jnp.asarray, b)  # noqa: E731
        print(f"CFM training on segment proposals from {args.segdb} "
              f"(top {args.seg_top_k}/image; no RPN / mask-head losses)")
    else:
        step_fn = make_train_step(model, tx, arch, train_cfg)
        to_device = lambda b: jax.tree.map(jnp.asarray, b)  # noqa: E731

    loader = TrainLoader(imdb, canvas_hw=arch.canvas, ims_per_batch=ims_per_batch,
                         gt_mask_size=args.gt_mask_size, seed=seed,
                         segdb_dir=args.segdb, seg_top_k=args.seg_top_k)
    logger = MetricsLogger(osp.join(out_dir, "train_metrics.jsonl"))
    timer = Timer()
    key = jax.random.PRNGKey(seed)
    max_iters = args.iters or cfg.TRAIN.MAX_ITERS

    for it in range(start, max_iters):
        batch = to_device(next(loader))
        key, k = jax.random.split(key)
        timer.tic()
        state, metrics = step_fn(state, batch, k)
        timer.toc()
        if (it + 1) % logger.print_every == 0 or it == start:
            m = {k_: float(v) for k_, v in jax.device_get(metrics).items()}
            logger.log(it + 1, m, lr=float(schedule(it)))
        if (it + 1) % cfg.TRAIN.SNAPSHOT_ITERS == 0 or (it + 1) == max_iters:
            path = save_checkpoint(out_dir, jax.device_get(state), step=it + 1)
            print(f"snapshot → {path}")
    print(f"done: {max_iters} iters, avg {timer.average_time:.3f}s/iter")


if __name__ == "__main__":
    main()
