"""Mask geometry — on-device, fixed-shape.

Behavioral port of the reference ``lib/transform/mask_transform.py``
(intersect_mask: crop a gt instance mask to an RoI and resize to MASK_SIZE;
mask_overlap: mask IoU) plus the demo/test-time "unmold" (resize the predicted
soft mask into its box and paste into the full-resolution canvas —
``tools/demo.py`` did this with cv2 on the host; here it is part of the XLA
program per the north star).

All resampling reuses the hat-matrix bilinear machinery from
``mnc_tpu.ops.roi_warp`` so every resize is a pair of small matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mnc_tpu.ops.roi_warp import interp_matrix


def resize_masks(masks: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (N, h, w) -> (N, H, W) (jax.image, XLA-fused)."""
    n = masks.shape[0]
    return jax.image.resize(masks, (n, *out_hw), method="linear")


def _box_grid_centers(boxes: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """(N, P) continuous source coords of P bin centers spanning each box."""
    lo = boxes[:, 1] if axis == 0 else boxes[:, 0]
    hi = boxes[:, 3] if axis == 0 else boxes[:, 2]
    span = hi - lo + 1.0
    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    return lo[:, None] + grid[None, :] * span[:, None] - 0.5


def crop_resize_from_canvas(
    canvas_masks: jnp.ndarray, boxes: jnp.ndarray, out_size: int
) -> jnp.ndarray:
    """Sample (N, H, W) canvas-space masks over (N, 4) boxes -> (N, M, M)."""
    _, h, w = canvas_masks.shape
    yc = _box_grid_centers(boxes, out_size, axis=0)
    xc = _box_grid_centers(boxes, out_size, axis=1)
    wy = interp_matrix(yc, h)  # (N, M, H)
    wx = interp_matrix(xc, w)  # (N, M, W)
    # Materialize the hats — XLA otherwise refuses them into the einsum and
    # recomputes per tile (0.47 → 0.27 ms at N=64 over 640×1024, bit-exact).
    wy, wx = jax.lax.optimization_barrier((wy, wx))
    return jnp.einsum("nph,nhw,nqw->npq", wy, canvas_masks.astype(jnp.float32), wx, precision="highest")


def intersect_mask(
    rois: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_masks: jnp.ndarray,
    mask_size: int,
    binarize: bool = True,
) -> jnp.ndarray:
    """Mask regression targets: crop each gt mask to an RoI, resize to M×M.

    ≙ reference ``mask_transform.intersect_mask`` (used by
    ProposalTargetLayer).  gt masks are stored gt-box-cropped at a fixed
    resolution (the maskdb convention): ``gt_masks[i]`` is (S, S) covering
    ``gt_boxes[i]``.

    Args:
      rois: (N, 4) sampled RoIs (image coords).
      gt_boxes: (N, 4) the matched gt box per RoI.
      gt_masks: (N, S, S) the matched gt mask per RoI (float in [0,1]).
      mask_size: output M.
      binarize: threshold at 0.5 like the reference target.

    Returns (N, M, M) float32 targets; RoI area outside the gt box is 0.
    """
    s = gt_masks.shape[-1]

    # RoI bin centers in image coords, then into gt-box-normalized mask coords.
    yc_img = _box_grid_centers(rois, mask_size, axis=0) + 0.5  # undo -0.5 pixel shift
    xc_img = _box_grid_centers(rois, mask_size, axis=1) + 0.5
    gh = gt_boxes[:, 3] - gt_boxes[:, 1] + 1.0
    gw = gt_boxes[:, 2] - gt_boxes[:, 0] + 1.0
    yc = (yc_img - gt_boxes[:, 1:2]) / gh[:, None] * s - 0.5
    xc = (xc_img - gt_boxes[:, 0:1]) / gw[:, None] * s - 0.5

    wy = interp_matrix(yc, s)  # (N, M, S) — rows vanish outside the gt box
    wx = interp_matrix(xc, s)
    out = jnp.einsum("nps,nst,nqt->npq", wy, gt_masks.astype(jnp.float32), wx, precision="highest")
    if binarize:
        out = (out >= 0.5).astype(jnp.float32)
    return out


def mask_overlap(masks_a: jnp.ndarray, masks_b: jnp.ndarray) -> jnp.ndarray:
    """IoU between aligned binary masks: (..., H, W) x (..., H, W) -> (...)."""
    a = masks_a > 0.5
    b = masks_b > 0.5
    inter = jnp.sum(a & b, axis=(-2, -1)).astype(jnp.float32)
    union = jnp.sum(a | b, axis=(-2, -1)).astype(jnp.float32)
    return inter / jnp.maximum(union, 1.0)


def _paste_axis_weights(lo, hi, m, out_len):
    """(N, out_len, M) hat weights mapping M mask samples onto canvas pixels
    [0, out_len) for boxes spanning [lo, hi] — shared by the einsum and
    Pallas paste implementations so every geometric convention is identical.
    """
    span = hi - lo + 1.0
    t = (jnp.arange(out_len, dtype=jnp.float32) - lo[:, None] + 0.5) / span[:, None]
    coord = t * m - 0.5  # (N, out_len)
    wmat = interp_matrix(coord, m)  # (N, out_len, M)
    inside = (t >= 0.0) & (t < 1.0)
    # Clamp edge samples (reference resize replicates edges inside the box).
    wsum = jnp.sum(wmat, axis=-1, keepdims=True)
    edge = jnp.argmin(jnp.abs(coord[..., None] - jnp.arange(m)[None, None, :]), axis=-1)
    wmat = jnp.where(
        (wsum > 0.0) | ~inside[..., None],
        wmat,
        jax.nn.one_hot(edge, m, dtype=jnp.float32),
    )
    return wmat * inside[..., None].astype(jnp.float32)


def paste_masks(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    canvas_hw: tuple[int, int],
    binarize_thresh: float | None = None,
    impl: str = "einsum",
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Unmold predicted masks into the full-resolution canvas.

    ≙ the reference demo/test unmold (cv2.resize into the box + paste,
    ``tools/demo.py``) but fused into XLA: per instance, the paste is the
    transposed hat-matrix pair  out = Wy^T @ mask @ Wx  restricted to the box.

    Args:
      masks: (N, M, M) soft masks in box frame.
      boxes: (N, 4) image-coordinate boxes.
      canvas_hw: static (H, W) output size.
      binarize_thresh: if set, returns bool via > thresh
        (reference BINARIZE_THRESH = 0.4).
      impl: "einsum" (XLA; the canvas product round-trips HBM) or "pallas"
        (fused binarize kernel, TPU; requires binarize_thresh).
      compute_dtype: dtype of the binarized-path canvas einsum (TEST.
        PASTE_DTYPE).  bf16 (default) halves the HBM round-trip; boundary
        pixels within bf16 eps of the threshold may flip vs f32 (<1e-3 of
        pixels — tests/test_masks.py bounds it).  Pass jnp.float32 for
        reference-exact parity runs.  Ignored by the unbinarized path
        (always f32) and the pallas kernel (f32 accumulate by design).

    Returns (N, H, W) float32 (or bool when binarized).
    """
    h, w = canvas_hw
    m = masks.shape[-1]

    wy = _paste_axis_weights(boxes[:, 1], boxes[:, 3], m, h)  # (N, H, M)
    wx = _paste_axis_weights(boxes[:, 0], boxes[:, 2], m, w)  # (N, W, M)
    # Force the hat matrices to materialize.  Without the barrier XLA fuses
    # the whole hat construction (incl. the argmin/one_hot edge machinery)
    # INTO the canvas einsum and recomputes it per output tile: measured
    # 0.68–0.80 ms for the K=100 640×1024 paste vs 0.17 ms with the barrier
    # (v5e, docs/results/paste_kernel_r4.jsonl) — a 4× win for ~18 MB of
    # extra HBM.  Output is bit-identical.
    wy, wx = jax.lax.optimization_barrier((wy, wx))
    if impl == "pallas" and binarize_thresh is not None:
        from mnc_tpu.ops.pallas.paste_kernel import paste_binarize_pallas

        return paste_binarize_pallas(
            wy, masks, jnp.swapaxes(wx, -1, -2), binarize_thresh)
    if binarize_thresh is not None:
        # Binarized path: the (N, H, W) product only feeds a `> thresh`
        # compare — mask values are in [0, 1] and bf16 error (~4e-3) is far
        # below any binarization threshold, so run the canvas-sized matmul
        # (the single largest postprocess tensor) in bf16: halves its HBM
        # round-trip.  Bool output: 4x less traffic again than f32.
        cd = compute_dtype
        out = jnp.einsum("nhp,npq,nwq->nhw", wy.astype(cd),
                         masks.astype(cd), wx.astype(cd))
        return out > binarize_thresh
    return jnp.einsum("nhp,npq,nwq->nhw", wy, masks.astype(jnp.float32), wx)
