#!/usr/bin/env python
"""Emit a synthetic-shapes dataset in REAL COCO format (VERDICT r4 item 5).

The COCO stretch config (BASELINE.json configs[4], SURVEY §7.8) has a reader
(``data/coco.py``) and an averaged-AP evaluator, but no COCO-format dataset
can be downloaded in a zero-egress sandbox.  This writes one from the
synthetic-shapes generator — real jpgs under ``<root>/coco/images/<split>/``
and a real ``instances_<split>.json`` whose segmentations alternate between
**polygon lists and compressed RLE strings** (both decode paths exercised) —
so the full reference COCO pipeline (COCOSeg → TrainLoader → train →
``test_net --coco-ap``) runs end-to-end:

    python tools/make_coco_synth.py --root data/coco_synth \
        --splits synthtrain=64 synthval=16
    python tools/train_net.py --imdb coco_synthtrain \
        --set DATA_DIR data/coco_synth ...
"""

import _init_paths  # noqa: F401
import argparse
import json
import os
import os.path as osp

import numpy as np


def emit_coco_synth(root: str, split: str, num_images: int,
                    canvas_hw=(480, 640), num_classes=6, seed=0,
                    n_range=(2, 5), quality=95) -> str:
    """Write images + annotations; returns the annotations path."""
    import cv2

    from mnc_tpu.config import cfg
    from mnc_tpu.data.coco import encode_coco_rle
    from mnc_tpu.data.synthetic import SHAPE_NAMES, SyntheticShapes

    gen = SyntheticShapes(canvas_hw=canvas_hw, num_classes=num_classes,
                          max_gt=8, gt_mask_size=112, n_range=n_range,
                          seed=seed, num_images=num_images)
    img_dir = osp.join(root, "images", split)
    ann_dir = osp.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    means = cfg.PIXEL_MEANS.reshape(1, 1, 3)
    h, w = canvas_hw
    for i in range(num_images):
        ex = gen.example(i)
        # synthetic scenes are mean-subtracted floats; shift back into BGR
        # u8 gamut for a real jpg (the loader re-subtracts the means)
        bgr = np.clip(ex["image"] + means, 0, 255).astype(np.uint8)
        fname = f"{split}_{i:06d}.jpg"
        cv2.imwrite(osp.join(img_dir, fname),
                    bgr, [cv2.IMWRITE_JPEG_QUALITY, quality])
        image_id = i + 1
        images.append({"id": image_id, "file_name": fname,
                       "height": h, "width": w})
        fulls = gen.full_masks(i)
        k = 0
        for g in range(gen.max_gt):
            if not ex["gt_valid"][g]:
                continue
            mask = (fulls[k] > 0.5).astype(np.uint8)
            k += 1
            x1, y1, x2, y2 = ex["gt_boxes"][g]
            area = float(mask.sum())
            if area < 1:
                continue
            if ann_id % 2:  # odd ids: polygon segmentation
                contours, _ = cv2.findContours(
                    mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
                polys = [c.reshape(-1).astype(float).tolist()
                         for c in contours if len(c) >= 3]
                if not polys:
                    continue
                seg = polys
            else:  # even ids: compressed RLE
                seg = encode_coco_rle(mask)
            annotations.append({
                "id": ann_id, "image_id": image_id,
                "category_id": int(ex["gt_classes"][g]),
                "bbox": [float(x1), float(y1),
                         float(x2 - x1 + 1), float(y2 - y1 + 1)],
                "area": area, "iscrowd": 0, "segmentation": seg,
            })
            ann_id += 1
    categories = [{"id": c, "name": SHAPE_NAMES[c - 1],
                   "supercategory": "shape"} for c in range(1, num_classes)]
    ann_path = osp.join(ann_dir, f"instances_{split}.json")
    with open(ann_path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    print(f"{split}: {len(images)} images, {len(annotations)} annotations "
          f"({sum(1 for a in annotations if isinstance(a['segmentation'], list))}"
          f" polygon / "
          f"{sum(1 for a in annotations if isinstance(a['segmentation'], dict))}"
          f" RLE) → {ann_path}")
    return ann_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/coco_synth",
                    help="DATA_DIR to emit under (dataset goes to ROOT/coco)")
    ap.add_argument("--splits", nargs="+", default=["synthtrain=64",
                                                    "synthval=16"],
                    metavar="NAME=N")
    ap.add_argument("--canvas", type=int, nargs=2, default=[480, 640])
    ap.add_argument("--num-classes", type=int, default=6)
    ap.add_argument("--n-range", type=int, nargs=2, default=[2, 5])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    for spec in args.splits:
        name, n = spec.split("=")
        emit_coco_synth(osp.join(args.root, "coco"), name, int(n),
                        canvas_hw=tuple(args.canvas),
                        num_classes=args.num_classes, seed=args.seed,
                        n_range=tuple(args.n_range))
    print(f"done — use with --set DATA_DIR {args.root}")


if __name__ == "__main__":
    main()
