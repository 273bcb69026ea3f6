"""Pallas TPU kernel for differentiable RoI warping.

Kernel equivalent of the reference ``roi_warping_layer.cu`` forward, designed
for the v5e roofline rather than translated: the XLA einsum formulation's
(N, PH, W, C) intermediate round-trips HBM (measured 87% of HBM peak,
tools/profile_net.py --mfu, r4) — here the conv5 feature map (2.6 MB bf16 at
the 640×1024 canvas → 40×64×512) and every intermediate live wholly in VMEM,
so HBM traffic is just "read F once + write the warped RoIs".

Kernel shape (r4 rewrite; the r2 kernel ran f32 matmuls one-RoI-at-a-time and
lost to the einsum ~3×, this one is within ~1.4× — see the honest negative
result below):

- **Chunked grid**: one program per ``R_PER_CHUNK=8`` RoIs, not per RoI —
  stacking hat matrices lifts the matmul m-dim from 14 (11% of the 128-row
  MXU) to 112.
- **bf16 matmuls** with f32 accumulation (``preferred_element_type``) — the
  r2 kernel upcast features to f32, dropping the MXU to its slow f32 path.
  Hat weights are computed in f32 and cast to bf16, exactly like the einsum
  path's ``wy.astype(features.dtype)``.
- **x-first + block-diagonal y contraction**: dot1 contracts W against a
  pre-transposed feature map (W, H·C); dot2 multiplies a block-diagonal
  (R·PH, R·H) hat matrix against the (R·H, PW·C) intermediate, producing
  (R, PH, PW, C) directly in output layout.  The block-diagonal zeros waste
  R× padded FLOPs on paper but keep everything in two MXU-shaped matmuls —
  measured faster than per-RoI loops.

Measured r4 (v5e, N=304 @ 40×64×512→14×14, tools/pallas_tpu_check.py):
einsum 0.74–0.92 ms, this kernel 1.10 ms, invariant to chunk size 8/16 and to
sublane-aligning the row groups — i.e. it is bound by the in-VMEM relayout of
the (R·PW, H·C) intermediate between the two contractions.  The separable
bilinear map fundamentally transposes its intermediate between the x- and
y-contractions: the einsum pays that through HBM (measured 87% of HBM peak —
effectively AT the memory wall), Mosaic pays it in VMEM relayout ops, and on
v5e the relayout path is the slower of the two.  Conclusion: the XLA einsum
is near-optimal for this op on this hardware; ``impl='einsum'`` stays the
default, and this kernel remains a validated, documented alternative.

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

R_PER_CHUNK = 8  # RoIs per program: m = R·16 = 128 = the MXU row count


def _hat(lo, span, nbins, src, scale, nrows=None):
    """Hat-function interpolation matrix (nrows or nbins, src) for one RoI
    axis; rows ≥ nbins (sublane padding) are zero."""
    nrows = nbins if nrows is None else nrows
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (nrows, src), 0).astype(jnp.float32)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (nrows, src), 1).astype(jnp.float32)
    centers = lo * scale + (p_idx + 0.5) / nbins * span - 0.5
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(centers - s_idx))
    return wgt * (p_idx < nbins)


def _warp_kernel(rois_ref, feat_t_ref, out_ref, *, out_hw, spatial_scale,
                 h, w, c, r_chunk):
    ph, pw = out_hw
    # Sublane alignment: pad the per-RoI row groups to a multiple of 8 so
    # every slice / transpose / write below starts on a sublane boundary
    # (misaligned 14-row relayouts take Mosaic's slow path).
    php = -(-ph // 8) * 8
    pwp = -(-pw // 8) * 8
    i = pl.program_id(0)
    coords = []
    for j in range(r_chunk):  # static unroll: scalar SMEM reads
        base = i * r_chunk + j
        coords.append((rois_ref[base, 0], rois_ref[base, 1],
                       rois_ref[base, 2], rois_ref[base, 3]))

    dtype = feat_t_ref.dtype
    # dot1: stacked x-hats (R·PWp, W) @ (W, H·C) -> (R·PWp, H·C); m = R·16
    wx = jnp.concatenate(
        [_hat(x1, (x2 - x1 + 1.0) * spatial_scale, pw, w, spatial_scale,
              nrows=pwp)
         for (x1, _, x2, _) in coords], 0).astype(dtype)
    ft = feat_t_ref[:].reshape(w, h * c)
    t1 = jnp.dot(wx, ft, preferred_element_type=jnp.float32)

    # rearrange (R·PWp, H·C) -> (R·H, PWp·C) with per-RoI slices (Mosaic has
    # no 4D shape-cast; aligned slice + 2-leading-dim transpose +
    # minor-collapse are all supported relayouts)
    t1 = t1.astype(dtype)
    t_rows = []
    for j in range(r_chunk):
        tj = t1[j * pwp:(j + 1) * pwp, :].reshape(pwp, h, c)
        t_rows.append(jnp.swapaxes(tj, 0, 1).reshape(h, pwp * c))
    t2 = jnp.concatenate(t_rows, 0)  # (R·H, PWp·C)

    # dot2: block-diagonal y-hat (R·PHp, R·H) @ (R·H, PWp·C) -> (R·PHp,
    # PWp·C), which IS (R, PHp, PWp, C) row-major — no output transpose.
    # Built directly in 2D: row m = r·PHp + p, col k = r'·H + hh; nonzero
    # iff r == r' and p < PH, value = hat(yc(r, p) - hh).
    m_idx = jax.lax.broadcasted_iota(jnp.int32, (r_chunk * php, r_chunk * h), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (r_chunk * php, r_chunk * h), 1)
    r_row = m_idx // php
    p_idx = (m_idx % php).astype(jnp.float32)
    r_col = k_idx // h
    h_idx = (k_idx % h).astype(jnp.float32)
    y1_v = jnp.zeros_like(p_idx)
    sp_v = jnp.zeros_like(p_idx)
    for j, (_, y1, _, y2) in enumerate(coords):  # R selects: per-row scalars
        on = r_row == j
        y1_v = jnp.where(on, y1, y1_v)
        sp_v = jnp.where(on, (y2 - y1 + 1.0) * spatial_scale, sp_v)
    yc = y1_v * spatial_scale + (p_idx + 0.5) / ph * sp_v - 0.5
    wy2 = jnp.maximum(0.0, 1.0 - jnp.abs(yc - h_idx))
    wy2 = jnp.where((r_row == r_col) & (p_idx < ph), wy2, 0.0).astype(dtype)

    out = jnp.dot(wy2, t2, preferred_element_type=jnp.float32)
    for j in range(r_chunk):  # aligned per-RoI writes; crop the row/col pads
        oj = out[j * php:j * php + ph, :].reshape(ph, pwp, c)
        out_ref[j] = oj[:, :pw, :].astype(out_ref.dtype)


def _roi_warp_pallas_fwd_impl(features, rois, out_hw, spatial_scale):
    h, w, c = features.shape
    n = rois.shape[0]
    ph, pw = out_hw
    r_chunk = R_PER_CHUNK if n % R_PER_CHUNK == 0 else (
        max(r for r in (4, 2, 1) if n % r == 0))
    feat_t = jnp.swapaxes(features, 0, 1)  # (W, H, C): x-first contraction
    kernel = functools.partial(
        _warp_kernel, out_hw=out_hw, spatial_scale=float(spatial_scale),
        h=h, w=w, c=c, r_chunk=r_chunk)
    return pl.pallas_call(
        kernel,
        grid=(n // r_chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rois (N, 4): scalar reads
            # constant block index -> Mosaic fetches F into VMEM once
            pl.BlockSpec((w, h, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r_chunk, ph, pw, c), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ph, pw, c), features.dtype),
        # The (R·PW, H·C) f32 intermediate overflows the 16 MB default
        # scoped-vmem stack; v5e has 128 MB of VMEM — raise the cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        # Tests run on a forced-CPU mesh; interpret mode keeps them meaningful.
        interpret=jax.default_backend() != "tpu",
    )(rois.astype(jnp.float32), feat_t)


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
