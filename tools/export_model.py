#!/usr/bin/env python
"""Export a trained checkpoint to deployment params (npz).

≙ the deployment half of the reference snapshot flow: folds the bbox-target
normalization stats into the bbox_pred weights (SolverWrapper.snapshot
semantics) so the exported model emits raw deltas, and writes a flat npz
(the ``.caffemodel`` role).

    python tools/export_model.py --ckpt output/run1 --out model.npz \
        [--no-unnormalize]

``--stablehlo out.jaxexport`` additionally serializes the FULL canvas-space
inference program (weights baked in, lowered for cpu+tpu) via ``jax.export``
— loadable and callable from any JAX process without mnc_tpu's model code,
the TPU-native analogue of shipping the prototxt+caffemodel pair
(see mnc_tpu/pipeline/export.py).  ``--stablehlo-batch B`` exports the
batched (detect_many/serving) program instead of the single-image one.
"""

import _init_paths  # noqa: F401
import argparse
import os.path as osp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="checkpoint dir or path")
    ap.add_argument("--out", default=None,
                    help="output .npz (default from TRAIN.SNAPSHOT_PREFIX)")
    ap.add_argument("--no-unnormalize", action="store_true")
    ap.add_argument("--stablehlo", default=None, metavar="PATH",
                    help="also serialize the full inference program "
                         "(weights baked in) via jax.export")
    ap.add_argument("--stablehlo-batch", type=int, default=None, metavar="B",
                    help="export the batched (B-image) program instead of "
                         "the single-image one")
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mnc_tpu.config import cfg, cfg_from_file, cfg_from_list
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.train.loop import TrainState
    from mnc_tpu.train.optim import make_optimizer
    from mnc_tpu.utils.checkpoint import (
        export_params,
        latest_checkpoint,
        restore_checkpoint,
        save_npz,
    )

    if args.cfg:
        cfg_from_file(args.cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    arch = MNCArch.from_cfg(train=False)
    model = MNC(arch=arch)
    img0 = jnp.zeros((*arch.canvas, 3), jnp.float32)
    info0 = jnp.array([arch.canvas[0], arch.canvas[1], 1.0])
    params = model.init(jax.random.PRNGKey(0), img0, info0)

    path = args.ckpt
    if osp.isdir(path) and not osp.basename(path).startswith("ckpt_"):
        path = latest_checkpoint(path)
        assert path, f"no checkpoint under {args.ckpt}"
    tx = make_optimizer(params)
    state = restore_checkpoint(path, TrainState.create(params, tx))
    out = state.params
    if not args.no_unnormalize:
        out = export_params(out, cfg.TRAIN.BBOX_NORMALIZE_MEANS,
                            cfg.TRAIN.BBOX_NORMALIZE_STDS)
        print("folded bbox normalization stats into bbox_pred")
    out_path = args.out
    if out_path is None:
        # reference snapshot naming: {prefix}{infix}_iter_{N}.caffemodel
        out_path = (f"{cfg.TRAIN.SNAPSHOT_PREFIX}{cfg.TRAIN.SNAPSHOT_INFIX}"
                    f"_iter_{int(state.step)}.npz")
    # record the regressor convention so npz consumers configure the stage
    # bridge correctly (re-applying stds to already-raw deltas silently
    # shrinks 5-stage refinements ~5-10x)
    save_npz(out_path, out,
             meta={"bbox_pred_normalized": bool(args.no_unnormalize)})
    print(f"exported {path} → {out_path}")

    if args.stablehlo:
        from mnc_tpu.pipeline.export import export_inference, save_exported

        # the artifact bakes the CHECKPOINT-convention params (normalized
        # deltas) with the matching default arch — the same pairing serve.py
        # --ckpt uses; the un-normalization question never leaves the npz
        # world because the stage bridge is INSIDE the exported program
        blob = export_inference(model, state.params,
                                batch=args.stablehlo_batch)
        save_exported(args.stablehlo, blob)
        shape = (f"batch={args.stablehlo_batch}" if args.stablehlo_batch
                 else "single-image")
        print(f"exported {shape} inference program → {args.stablehlo} "
              f"({len(blob) / 1e6:.1f} MB, platforms cpu+tpu)")


if __name__ == "__main__":
    main()
