#!/usr/bin/env python
"""Quantify mask-target fidelity vs exact full-resolution crops.

Round-1 verdict "What's weak" #5: gt masks are stored gt-box-cropped at a
fixed S×S resolution (maskdb convention) and later resampled to the M×M RoI
target by ``intersect_mask`` — two lossy resamples where the reference cropped
the full-resolution mask per RoI.  This study measures the error that chain
introduces, as a function of the stored resolution S and the downsample
filter, against targets computed directly from the full-resolution mask.

    python tools/mask_fidelity_study.py [--trials 200] [--mask-size 21]

Output: mean/p5 IoU between pipeline targets and exact targets per (S,
filter), printed as a table — the basis for the gt_mask_size default.
"""

import _init_paths  # noqa: F401
import argparse

import numpy as np


def exact_target(full_mask, gt_box, roi, m):
    """Reference-style target: sample the FULL-RES mask at the RoI's m×m bin
    centers (nearest), zero outside the gt box."""
    x1, y1, x2, y2 = gt_box
    rh = roi[3] - roi[1] + 1.0
    rw = roi[2] - roi[0] + 1.0
    ys = roi[1] + (np.arange(m) + 0.5) / m * rh - 0.5
    xs = roi[0] + (np.arange(m) + 0.5) / m * rw - 0.5
    yy = np.round(ys).astype(int)
    xx = np.round(xs).astype(int)
    h, w = full_mask.shape
    inside_y = (yy >= y1) & (yy <= y2) & (yy >= 0) & (yy < h)
    inside_x = (xx >= x1) & (xx <= x2) & (xx >= 0) & (xx < w)
    t = full_mask[np.clip(yy, 0, h - 1)[:, None], np.clip(xx, 0, w - 1)[None, :]]
    return (t * inside_y[:, None] * inside_x[None, :]).astype(np.float32)


def store_cropped(full_mask, gt_box, s, filt):
    """maskdb storage step: crop to gt box, resize to (s, s)."""
    x1, y1, x2, y2 = [int(v) for v in gt_box]
    crop = full_mask[y1:y2 + 1, x1:x2 + 1].astype(np.float32)
    if filt == "nearest":
        ys = np.clip(((np.arange(s) + 0.5) * crop.shape[0] / s).astype(int),
                     0, crop.shape[0] - 1)
        xs = np.clip(((np.arange(s) + 0.5) * crop.shape[1] / s).astype(int),
                     0, crop.shape[1] - 1)
        return crop[np.ix_(ys, xs)]
    import cv2

    return cv2.resize(crop, (s, s), interpolation=cv2.INTER_AREA)


def iou(a, b):
    inter = np.logical_and(a > 0.5, b > 0.5).sum()
    union = np.logical_or(a > 0.5, b > 0.5).sum()
    return inter / union if union else 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--mask-size", type=int, default=21)
    ap.add_argument("--canvas", type=int, nargs=2, default=(640, 1024))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mnc_tpu.data.synthetic import _render_shape
    from mnc_tpu.ops.masks import intersect_mask

    rs = np.random.RandomState(0)
    h, w = args.canvas
    m = args.mask_size

    cases = []  # (full_mask, gt_box, roi)
    for _ in range(args.trials):
        kind = rs.randint(0, 5)
        bw = rs.randint(max(12, w // 10), w // 2)
        bh = rs.randint(max(12, h // 10), h // 2)
        x1 = rs.randint(0, w - bw)
        y1 = rs.randint(0, h - bh)
        full = np.zeros((h, w), np.float32)
        full[y1:y1 + bh, x1:x1 + bw] = _render_shape(kind, bh, bw)
        gt = np.array([x1, y1, x1 + bw - 1, y1 + bh - 1], np.float32)
        # an fg RoI: jittered gt box (IoU >= ~0.5, like sampled positives)
        jit = rs.uniform(-0.2, 0.2, 4) * [bw, bh, bw, bh]
        roi = np.array([max(0, gt[0] + jit[0]), max(0, gt[1] + jit[1]),
                        min(w - 1, gt[2] + jit[2]), min(h - 1, gt[3] + jit[3])],
                       np.float32)
        cases.append((full, gt, roi))

    exact = np.stack([exact_target(f, g, r, m) for f, g, r in cases])

    print(f"{args.trials} shapes on {h}x{w}, mask_size {m}; "
          f"IoU of pipeline target vs exact full-res target:")
    print(f"{'S':>5} {'filter':>8} {'meanIoU':>8} {'p5':>7} {'min':>7}")
    for s in (28, 56, 112, 224):
        for filt in ("nearest", "area"):
            stored = np.stack([store_cropped(f, g, s, filt)
                               for f, g, _ in cases])
            rois = jnp.asarray(np.stack([r for _, _, r in cases]))
            gts = jnp.asarray(np.stack([g for _, g, _ in cases]))
            out = np.asarray(intersect_mask(rois, gts, jnp.asarray(stored), m))
            ious = np.array([iou(a, b) for a, b in zip(out, exact)])
            print(f"{s:>5} {filt:>8} {ious.mean():8.4f} "
                  f"{np.percentile(ious, 5):7.4f} {ious.min():7.4f}")


if __name__ == "__main__":
    main()
