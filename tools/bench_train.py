#!/usr/bin/env python
"""Training-step throughput benchmark (full-size VGG-16 5-stage).

The reference trained 25k iterations in ~32 h on a K40 (≈4.6 s/iter,
BASELINE.md).  This measures our full jitted train step — trunk fwd/bwd, RPN
losses, on-device target sampling, both cascade passes, SGD update — with
the chained-state timing that works on the remote-tunnel platform (the new
TrainState feeds the next step, forcing sequential execution).

    python tools/bench_train.py [--batch 1] [--iters 8] [--stages 5] [--cpu]
"""

import _init_paths  # noqa: F401
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stages", type=int, default=5, choices=(3, 5))
    ap.add_argument("--canvas", type=int, nargs=2, default=None,
                    help="override canvas (smoke-testing on CPU)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mnc_tpu.config import cfg
    from mnc_tpu.data.synthetic import SyntheticShapes
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.train.loop import TrainState, make_train_step
    from mnc_tpu.train.optim import make_optimizer

    over = dict(n_stages=args.stages)
    if args.canvas:
        over.update(canvas=tuple(args.canvas), anchor_scales=(2, 4, 8),
                    rpn_min_size=4.0, num_classes=4, fc_dim=64, mask_fc_dim=32,
                    mask_size=9, warp_hw=4)
    arch = MNCArch.from_cfg(train=True, **over)
    model = MNC(arch=arch)
    train_cfg = {k: cfg.TRAIN[k] for k in (
        "RPN_POSITIVE_OVERLAP", "RPN_NEGATIVE_OVERLAP", "RPN_BATCHSIZE",
        "RPN_FG_FRACTION", "BATCH_SIZE", "FG_FRACTION", "FG_THRESH",
        "BG_THRESH_HI", "BG_THRESH_LO")}

    from mnc_tpu.data.synthetic import SHAPE_NAMES

    # the generator draws <= len(SHAPE_NAMES) fg classes; a 21-class arch
    # just sees labels from the low range (valid subset)
    data = SyntheticShapes(canvas_hw=arch.canvas,
                           num_classes=min(arch.num_classes,
                                           1 + len(SHAPE_NAMES)),
                           max_gt=min(int(cfg.STATIC.MAX_GT), 8), gt_mask_size=28,
                           n_range=(2, 5), seed=0)
    if args.batch == 1:
        batch = {k: jnp.asarray(v) for k, v in data.example(0).items()}
    else:
        batch = {k: jnp.asarray(v) for k, v in data.batch(range(args.batch)).items()}

    img0 = jnp.zeros((*arch.canvas, 3), jnp.float32)
    info0 = jnp.array([arch.canvas[0], arch.canvas[1], 1.0])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img0, info0)
    tx = make_optimizer(params)
    step = make_train_step(model, tx, arch, train_cfg, donate=False)
    state0 = TrainState.create(params, tx)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, metrics = step(state0, batch, key)
    float(jax.device_get(metrics["total"]))
    compile_s = time.perf_counter() - t0

    def timed(n):
        s = state0
        t0 = time.perf_counter()
        for i in range(n):
            s, m = step(s, batch, jax.random.fold_in(key, i))
        float(jax.device_get(m["total"]))
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(args.iters + 1) for _ in range(3))
    per = (tn - t1) / args.iters
    if args.verbose:
        print(f"# compile={compile_s:.1f}s step={per * 1e3:.1f}ms "
              f"(batch {args.batch}, {args.stages}-stage, canvas {arch.canvas})")
    print(json.dumps({
        "metric": "train_step_img_per_sec",
        "value": round(args.batch / per, 2),
        "unit": "img/s",
        "vs_baseline": round((args.batch / per) / (1 / 4.6), 2),
    }))


if __name__ == "__main__":
    main()
