"""Differentiable RoI warping and RoI pooling.

TPU-native re-design of the reference's two RoI ops:

- ``roi_warp`` ≙ ``caffe-mnc/src/caffe/layers/roi_warping_layer.{cpp,cu}`` —
  MNC's novel bilinear crop-and-resize, differentiable w.r.t. BOTH the feature
  map and the 4 box coordinates (the mechanism that lets box-regression
  gradients flow from later cascade stages into the RPN; CVPR16 §3.x).
- ``roi_pool`` ≙ ``caffe-mnc/src/caffe/layers/roi_pooling_layer.{cpp,cu}`` —
  Fast-RCNN quantized max pooling (argmax backward to features only).

Design (MXU formulation, not a CUDA translation)
------------------------------------------------
Bilinear sampling at a grid of bin centers is a *linear* map of the feature
map, separable by axis.  For each RoI build hat-function interpolation
matrices

    Wy[n, p, h] = max(0, 1 - |yc[n, p] - h|)      (PH, H)
    Wx[n, q, w] = max(0, 1 - |xc[n, q] - w|)      (PW, W)

and compute  out[n] = einsum('ph,hwc,qw->pqc', Wy[n], F, Wx[n]).  Two batched
matmuls ride the MXU; gradients w.r.t. features AND box coordinates fall out
of autodiff (the hat weights are piecewise-linear in the bin centers, which
are affine in the box coords).  This replaces the reference's hand-written
``d(bilinear)/d(x1,y1,x2,y2)`` backward kernel with ~30 lines of jnp.

A Pallas kernel variant lives in ``mnc_tpu.ops.pallas.roi_warp_kernel``
(``impl='pallas'``); a direct gather-based reference implementation
(``roi_warp_ref``) backs the numeric tests.

Sampling convention (Caffe-compatible, documented for parity):
pixel centers at integer coordinates; RoI width uses the Caffe +1 convention;
bin (p, q) of RoI (x1, y1, x2, y2) samples at

    yc = y1*s + (p + 0.5) * (y2 - y1 + 1) * s / PH - 0.5
    xc = x1*s + (q + 0.5) * (x2 - x1 + 1) * s / PW - 0.5

with zero padding outside the feature map (out-of-range hat weights vanish).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bin_centers(rois: jnp.ndarray, out_size: int, spatial_scale: float, axis: int):
    """Continuous sampling coords of bin centers along one axis.

    Args:
      rois: (N, 4) as (x1, y1, x2, y2) in image coords.
      out_size: number of bins P along this axis.
      spatial_scale: image→feature coordinate scale (1/16 for conv5).
      axis: 0 → y (rows), 1 → x (cols).

    Returns: (N, P) float32 coords in feature space.
    """
    lo = rois[:, 1] if axis == 0 else rois[:, 0]
    hi = rois[:, 3] if axis == 0 else rois[:, 2]
    span = (hi - lo + 1.0) * spatial_scale
    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    return lo[:, None] * spatial_scale + grid[None, :] * span[:, None] - 0.5


def interp_matrix(centers: jnp.ndarray, src_size: int) -> jnp.ndarray:
    """Hat-function interpolation weights (N, P, S) for coords (N, P)."""
    src = jnp.arange(src_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(centers[..., None] - src[None, None, :]))


def _warp_einsum(features: jnp.ndarray, rois: jnp.ndarray, out_hw, spatial_scale):
    ph, pw = out_hw
    h, w, c = features.shape
    yc = bin_centers(rois, ph, spatial_scale, axis=0)
    xc = bin_centers(rois, pw, spatial_scale, axis=1)
    wy = interp_matrix(yc, h)  # (N, PH, H)
    wx = interp_matrix(xc, w)  # (N, PW, W)
    # Contract x FIRST: the (N, H, PW, C) intermediate is the op's HBM
    # traffic (written + re-read), and H < W on the landscape canvases the
    # scale rule produces (40 < 64 at 640×1024) — x-first is 37% less
    # traffic than y-first for identical math.  It stays in the feature
    # dtype (bf16 on the TPU path); f32 would double the traffic again.
    tmp = jnp.einsum("nqw,hwc->nhqc", wx.astype(features.dtype), features,
                     preferred_element_type=jnp.float32).astype(features.dtype)
    # (N, PH, H) x (N, H, PW, C) -> (N, PH, PW, C): batched matmul.
    out = jnp.einsum("nph,nhqc->npqc", wy.astype(features.dtype), tmp,
                     preferred_element_type=jnp.float32)
    return out.astype(features.dtype)


def _warp_gather(features: jnp.ndarray, rois: jnp.ndarray, out_hw,
                 spatial_scale) -> jnp.ndarray:
    """Direct 4-tap bilinear gather — the low-HBM-traffic formulation.

    The einsum path's (N, PH, W, C) intermediate dominates its HBM traffic
    (written + re-read ≈ 2·N·PH·W·C bytes ≈ 560 MB/img at the 304-RoI
    inference shapes — measured 87% of HBM peak, tools/profile_net.py --mfu
    r4).  Gathering the 4 neighbor taps per sample point reads only
    N·PH·PW·4·C ≈ 240 MB and writes the output.  Math identical to the hat-
    matrix einsum (same sampling convention, zero outside the map); grads
    flow to features (scatter-add) and to rois (through the tap weights,
    same subgradient as the hat version away from integer coords).
    """
    h, w, c = features.shape
    ph, pw = out_hw
    yc = bin_centers(rois, ph, spatial_scale, axis=0)  # (N, PH)
    xc = bin_centers(rois, pw, spatial_scale, axis=1)  # (N, PW)
    y0 = jnp.floor(yc)
    x0 = jnp.floor(xc)
    fy = yc - y0  # in [0, 1); d(fy)/d(yc) = 1 a.e.
    fx = xc - x0
    flat = features.reshape(h * w, c)
    out = jnp.zeros((rois.shape[0], ph, pw, c), jnp.float32)
    for dy in (0, 1):
        ys = y0 + dy
        wy = jnp.where(dy == 0, 1.0 - fy, fy)  # (N, PH)
        wy = wy * ((ys >= 0) & (ys < h))
        ysc = jnp.clip(ys, 0, h - 1).astype(jnp.int32)
        for dx in (0, 1):
            xs = x0 + dx
            wx = jnp.where(dx == 0, 1.0 - fx, fx)  # (N, PW)
            wx = wx * ((xs >= 0) & (xs < w))
            xsc = jnp.clip(xs, 0, w - 1).astype(jnp.int32)
            idx = ysc[:, :, None] * w + xsc[:, None, :]  # (N, PH, PW)
            vals = jnp.take(flat, idx.reshape(-1), axis=0)
            vals = vals.reshape(*idx.shape, c).astype(jnp.float32)
            out = out + (wy[:, :, None] * wx[:, None, :])[..., None] * vals
    return out.astype(features.dtype)


def roi_warp(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    out_hw: tuple[int, int] = (14, 14),
    spatial_scale: float = 1.0 / 16.0,
    impl: str = "einsum",
) -> jnp.ndarray:
    """Differentiable bilinear crop-and-resize of RoIs from a feature map.

    Args:
      features: (H, W, C) feature map (single image; vmap for batches).
      rois: (N, 4) boxes (x1, y1, x2, y2) in IMAGE coordinates.
      out_hw: static output resolution (PH, PW).
      spatial_scale: feature-grid scale (1/16 for a stride-16 trunk).
      impl: 'einsum' (XLA/MXU, default) or 'pallas' (Pallas kernel).

    Returns: (N, PH, PW, C); gradients flow to ``features`` and ``rois``.
    """
    if impl == "einsum":
        return _warp_einsum(features, rois, out_hw, spatial_scale)
    if impl == "gather":
        return _warp_gather(features, rois, out_hw, spatial_scale)
    if impl == "pallas":
        from mnc_tpu.ops.pallas.roi_warp_kernel import roi_warp_pallas

        return roi_warp_pallas(features, rois, out_hw, spatial_scale)
    raise ValueError(f"unknown impl {impl!r}")


def roi_warp_ref(features, rois, out_hw=(14, 14), spatial_scale=1.0 / 16.0):
    """Direct gather-based bilinear crop-and-resize — numeric oracle for tests.

    Mirrors the reference CUDA kernel structure: per sample point, gather the
    4 neighbors and blend; zero contribution outside the map.
    """
    features = jnp.asarray(features)
    h, w, _ = features.shape
    ph, pw = out_hw
    yc = bin_centers(rois, ph, spatial_scale, axis=0)  # (N, PH)
    xc = bin_centers(rois, pw, spatial_scale, axis=1)  # (N, PW)

    def one(yc_i, xc_i):
        yy = yc_i[:, None]  # (PH, 1)
        xx = xc_i[None, :]  # (1, PW)
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                ys = y0 + dy
                xs = x0 + dx
                wgt = (1.0 - jnp.abs(yy - ys)) * (1.0 - jnp.abs(xx - xs))
                inside = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
                ysc = jnp.clip(ys, 0, h - 1).astype(jnp.int32)
                xsc = jnp.clip(xs, 0, w - 1).astype(jnp.int32)
                ysb = jnp.broadcast_to(ysc, (ph, pw))
                xsb = jnp.broadcast_to(xsc, (ph, pw))
                vals = features[ysb, xsb]  # (PH, PW, C)
                out = out + jnp.where(inside[..., None], wgt[..., None] * vals, 0.0)
        return out

    return jax.vmap(one)(yc, xc)


@functools.partial(jax.jit, static_argnames=("out_hw", "spatial_scale"))
def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    out_hw: tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """Fast-RCNN quantized RoI max pooling (Caffe semantics).

    Caffe quantization preserved for parity (roi_pooling_layer.cpp): RoI corners
    are rounded on the feature grid, each output bin covers feature cells
    [floor(p*bh), ceil((p+1)*bh)) clipped to the map, and takes their max
    (empty bins → 0).  Fixed-shape realization: per RoI, build axis bin-
    membership masks over all H (W) cells and take a separable masked max —
    max_{h,w}(My[h,p] & Mx[w,q]) F[h,w,c] = max_h My (max_w Mx F).
    Backward (to features only) comes from autodiff of max.
    """
    h, w, _ = features.shape
    ph, pw = out_hw

    def c_round(x):
        # C/C++ std::round = half AWAY from zero — what the Caffe layer used.
        # jnp.round is half-to-even, which flips every corner landing exactly
        # on a .5 feature coordinate (e.g. x=8 at stride 16 → 0.5: Caffe→1,
        # round-half-even→0).  Caught by the independent golden fixture pack
        # (tests/fixtures/golden/roi_pool.npz, round 4).
        return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)

    x1 = c_round(rois[:, 0] * spatial_scale).astype(jnp.int32)
    y1 = c_round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    x2 = c_round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    y2 = c_round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)

    def axis_mask(lo, rsz, src_size, nbins):
        # mask[s, p] = cell s in [lo + floor(p*rsz/nbins),
        #                         lo + ceil((p+1)*rsz/nbins)).
        # EXACT integer rational arithmetic: floor(a/b) = a//b and
        # ceil(a/b) = (a+b-1)//b.  Float division here is a knife-edge —
        # XLA's f32 divide is reciprocal-based (1 ulp off correctly-rounded),
        # so ceil((q+1)*(rw/bins)) overshot exact-integer boundaries (e.g.
        # 7*(9/7) → 9.000001 → ceil 10), annexing a whole extra feature
        # column.  Caught by the golden fixture pack (round 4).
        p = jnp.arange(nbins, dtype=jnp.int32)
        start = (p * rsz) // nbins + lo
        end = ((p + 1) * rsz + nbins - 1) // nbins + lo
        s = jnp.arange(src_size, dtype=jnp.int32)
        return (s[:, None] >= start[None, :]) & (s[:, None] < end[None, :])

    def one(y1i, x1i, bhi, bwi):
        my = axis_mask(y1i, bhi, h, ph)  # (H, PH)
        mx = axis_mask(x1i, bwi, w, pw)  # (W, PW)
        neg = jnp.finfo(jnp.float32).min
        f = features.astype(jnp.float32)
        # max over w per x-bin: (H, PW, C)
        fx = jnp.where(mx[None, :, :, None], f[:, :, None, :], neg).max(axis=1)
        # max over h per y-bin: (PH, PW, C)
        out = jnp.where(my.T[:, :, None, None], fx[None, :, :, :], neg).max(axis=1)
        return jnp.where(out == neg, 0.0, out)

    out = jax.vmap(one)(y1, x1, roi_h, roi_w)
    return out.astype(features.dtype)
