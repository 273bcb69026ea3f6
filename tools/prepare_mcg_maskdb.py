#!/usr/bin/env python
"""Convert MCG segment proposals to the maskdb format (CFM support).

≙ reference ``tools/prepare_mcg_maskdb.py``: reads per-image MCG .mat files
(superpixels + candidate labels), reconstructs each candidate's binary mask,
crops it to its bounding box at a fixed resolution, and writes pickled
records consumable by the CFM path (``mnc_tpu.models.cfm``).

    python tools/prepare_mcg_maskdb.py --mcg-dir data/MCG-raw \
        --image-list data/sbd/val.txt --out data/cache/mcg_maskdb \
        [--mask-size 21] [--top-k 300]
"""

import _init_paths  # noqa: F401
import argparse
import os
import os.path as osp
import pickle

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mcg-dir", required=True)
    ap.add_argument("--image-list", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mask-size", type=int, default=21)
    ap.add_argument("--top-k", type=int, default=300)
    return ap.parse_args()


def mcg_candidates(mat_path: str, top_k: int):
    """Yield (mask, box) for the top_k MCG candidates of one image."""
    from scipy.io import loadmat

    data = loadmat(mat_path)
    superpixels = data["superpixels"]  # (H, W) int labels
    labels = data["labels"].ravel()  # object array of label lists
    for cand in labels[:top_k]:
        ids = np.asarray(cand).ravel()
        mask = np.isin(superpixels, ids)
        ys, xs = np.where(mask)
        if len(ys) == 0:
            continue
        box = np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)
        yield mask, box


def crop_resize(mask: np.ndarray, box: np.ndarray, size: int) -> np.ndarray:
    from mnc_tpu.utils.blob import resize_mask_area

    x1, y1, x2, y2 = box.astype(int)
    crop = mask[y1:y2 + 1, x1:x2 + 1].astype(np.float32)
    # area filter per tools/mask_fidelity_study.py (numpy fallback inside)
    return resize_mask_area(crop, (size, size))


def main():
    args = parse_args()
    with open(args.image_list) as f:
        ids = [x.strip() for x in f if x.strip()]
    os.makedirs(args.out, exist_ok=True)
    for i, image_id in enumerate(ids):
        mat = osp.join(args.mcg_dir, f"{image_id}.mat")
        if not osp.exists(mat):
            print(f"missing {mat}, skipping")
            continue
        boxes, masks = [], []
        for mask, box in mcg_candidates(mat, args.top_k):
            boxes.append(box)
            masks.append(crop_resize(mask, box, args.mask_size))
        rec = {
            "index": image_id,
            "boxes": np.asarray(boxes, np.float32),
            "masks": np.asarray(masks, np.float32),
        }
        with open(osp.join(args.out, f"{image_id}.pkl"), "wb") as f:
            pickle.dump(rec, f)
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(ids)}")
    print("done")


if __name__ == "__main__":
    main()
