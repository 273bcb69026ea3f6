"""Pallas TPU kernel for differentiable RoI warping.

Kernel equivalent of the reference ``roi_warping_layer.cu`` forward.  Grid is
one program per RoI; the conv5 feature map (H, W, C) lives wholly in VMEM
(2.6 MB bf16 at the 640×1024 canvas → 40×64×512), each program builds its
hat-function interpolation weights on the fly with ``broadcasted_iota`` and
runs two MXU matmuls — no gather, no host.

The backward pass (grads to features AND boxes) is delegated via
``jax.custom_vjp`` to the autodiff of the einsum formulation in
``mnc_tpu.ops.roi_warp`` — the two implementations compute the identical
linear map, so the VJP is exact for the kernel as well.

Scope note: whole-map-in-VMEM limits this kernel to feature maps ≲ 6 MB
(true for every MNC configuration; a tiled variant would DMA H-slabs for
larger canvases).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(rois_ref, feat_ref, out_ref, *, out_hw, spatial_scale, h, w, c):
    ph, pw = out_hw
    i = pl.program_id(0)
    x1 = rois_ref[i, 0]
    y1 = rois_ref[i, 1]
    x2 = rois_ref[i, 2]
    y2 = rois_ref[i, 3]

    span_y = (y2 - y1 + 1.0) * spatial_scale
    span_x = (x2 - x1 + 1.0) * spatial_scale

    # Hat-function interpolation weights, built from 2D iota.
    # Mosaic allows only integer iota — build and convert
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (ph, h), 0).astype(jnp.float32)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (ph, h), 1).astype(jnp.float32)
    yc = y1 * spatial_scale + (p_idx + 0.5) / ph * span_y - 0.5
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(yc - h_idx))  # (PH, H)

    q_idx = jax.lax.broadcasted_iota(jnp.int32, (pw, w), 0).astype(jnp.float32)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (pw, w), 1).astype(jnp.float32)
    xc = x1 * spatial_scale + (q_idx + 0.5) / pw * span_x - 0.5
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xc - w_idx))  # (PW, W)

    feat = feat_ref[:].astype(jnp.float32).reshape(h, w * c)
    t1 = jnp.dot(wy, feat, preferred_element_type=jnp.float32)  # (PH, W*C)
    t1 = t1.reshape(ph, w, c)
    for p in range(ph):  # static unroll: PH small matmuls on the MXU
        out_ref[0, p] = jnp.dot(wx, t1[p], preferred_element_type=jnp.float32).astype(
            out_ref.dtype
        )


def _roi_warp_pallas_fwd_impl(features, rois, out_hw, spatial_scale):
    h, w, c = features.shape
    n = rois.shape[0]
    ph, pw = out_hw
    kernel = functools.partial(
        _warp_kernel, out_hw=out_hw, spatial_scale=float(spatial_scale), h=h, w=w, c=c
    )
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rois (N, 4): scalar reads
            pl.BlockSpec((h, w, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ph, pw, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, ph, pw, c), features.dtype),
        # Tests run on a forced-CPU mesh; interpret mode keeps them meaningful.
        interpret=jax.default_backend() != "tpu",
    )(rois.astype(jnp.float32), features)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def roi_warp_pallas(features, rois, out_hw=(14, 14), spatial_scale=1.0 / 16.0):
    """Pallas-kernel RoI warp; same semantics/gradients as roi_warp(impl='einsum')."""
    return _roi_warp_pallas_fwd_impl(features, rois, out_hw, spatial_scale)


def _fwd(features, rois, out_hw, spatial_scale):
    out = _roi_warp_pallas_fwd_impl(features, rois, out_hw, spatial_scale)
    return out, (features, rois)


def _bwd(out_hw, spatial_scale, res, g):
    from mnc_tpu.ops.roi_warp import _warp_einsum

    features, rois = res
    _, vjp = jax.vjp(lambda f, r: _warp_einsum(f, r, out_hw, spatial_scale), features, rois)
    return vjp(g)


roi_warp_pallas.defvjp(_fwd, _bwd)
