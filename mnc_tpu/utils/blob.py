"""Image preprocessing — ≙ reference ``lib/utils/blob.py``.

``prep_im_for_blob``: BGR float, mean-pixel subtract, scale so the shorter
side hits SCALES[0] with the longer side capped at MAX_SIZE — the exact
reference rule — plus the TPU-native addition: the scale is further capped so
the scaled image fits the static canvas, into which it is zero-padded
(top-left anchored).  ``im_list_to_blob`` stacks canvases to a batch.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from mnc_tpu.config import cfg


def im_scale_for(shape_hw, target_size: int, max_size: int, canvas_hw) -> float:
    """The reference scale rule + canvas cap."""
    h, w = shape_hw
    short, long = min(h, w), max(h, w)
    scale = float(target_size) / short
    if round(scale * long) > max_size:
        scale = float(max_size) / long
    ch, cw = canvas_hw
    scale = min(scale, ch / h, cw / w)
    return scale


def prep_im_for_blob(
    im: np.ndarray,
    pixel_means: np.ndarray | None = None,
    target_size: int | None = None,
    max_size: int | None = None,
    canvas_hw=None,
    u8: bool = False,
):
    """BGR uint8/float image → (canvas_h, canvas_w, 3) float32 + im_info.

    Returns (canvas, im_info) where im_info = (scaled_h, scaled_w, scale).

    ``u8=True`` keeps the canvas uint8 and SKIPS the mean subtraction — the
    device program subtracts the means after upload (TEST.U8_TRANSFER): 4×
    less host→device traffic, which dominates over a remote device link.
    Mean subtraction commutes with the linear resize, so the only deviation
    from the reference float path is the ≤0.5-LSB uint8 rounding after
    resize.
    """
    if pixel_means is None:
        pixel_means = cfg.PIXEL_MEANS
    if target_size is None:
        target_size = cfg.TEST.SCALES[0]
    if max_size is None:
        max_size = cfg.TEST.MAX_SIZE
    if canvas_hw is None:
        canvas_hw = tuple(cfg.STATIC.CANVAS)

    if u8:
        im = np.ascontiguousarray(im, dtype=np.uint8)
    else:
        im = im.astype(np.float32, copy=True)
        im -= pixel_means.astype(np.float32)
    scale = im_scale_for(im.shape[:2], target_size, max_size, canvas_hw)
    if cv2 is not None:
        scaled = cv2.resize(im, None, fx=scale, fy=scale, interpolation=cv2.INTER_LINEAR)
    else:  # fallback: nearest via indexing
        h2 = int(round(im.shape[0] * scale))
        w2 = int(round(im.shape[1] * scale))
        ys = np.clip((np.arange(h2) / scale).astype(int), 0, im.shape[0] - 1)
        xs = np.clip((np.arange(w2) / scale).astype(int), 0, im.shape[1] - 1)
        scaled = im[np.ix_(ys, xs)]
    ch, cw = canvas_hw
    sh, sw = min(scaled.shape[0], ch), min(scaled.shape[1], cw)
    if u8:
        # pad with the (rounded) pixel means so the device-side mean
        # subtraction zeroes the padding, matching the float path's zeros
        canvas = np.empty((ch, cw, 3), np.uint8)
        canvas[:] = np.round(np.asarray(pixel_means)).astype(np.uint8).reshape(1, 1, 3)
    else:
        canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:sh, :sw] = scaled[:sh, :sw]
    im_info = np.array([sh, sw, scale], np.float32)
    return canvas, im_info


def im_list_to_blob(ims) -> np.ndarray:
    """Stack equal-shape canvases into a (B, H, W, 3) batch blob."""
    return np.stack(ims).astype(np.float32)


def device_normalize(images):
    """uint8 canvases → mean-subtracted float32 ON DEVICE (no-op for float).

    The other half of ``prep_im_for_blob(u8=True)``: host APIs and the train
    loader upload uint8 canvases (4× less host→device traffic — the dominant
    cost over a remote/tunneled device link) and the jitted program subtracts
    the pixel means after upload.  jit specializes on input dtype, so float
    callers trace through the identity branch unchanged.  cfg.PIXEL_MEANS is
    baked at trace time (as with every cfg-derived constant in a compiled
    variant)."""
    import jax.numpy as jnp

    if images.dtype == jnp.uint8:
        means = jnp.asarray(
            np.asarray(cfg.PIXEL_MEANS, np.float32).reshape(-1), jnp.float32)
        return images.astype(jnp.float32) - means
    return images


def resize_mask_area(mask, out_hw):
    """Host-side mask downsample: cv2 INTER_AREA when available (higher
    fidelity — tools/mask_fidelity_study.py), numpy nearest otherwise (cv2 is
    an optional dependency of data prep, not a hard one)."""
    oh, ow = out_hw
    m = np.asarray(mask, np.float32)
    if cv2 is not None:
        return cv2.resize(m, (ow, oh), interpolation=cv2.INTER_AREA)
    ys = np.clip(((np.arange(oh) + 0.5) * m.shape[0] / oh).astype(int),
                 0, m.shape[0] - 1)
    xs = np.clip(((np.arange(ow) + 0.5) * m.shape[1] / ow).astype(int),
                 0, m.shape[1] - 1)
    return m[np.ix_(ys, xs)]
