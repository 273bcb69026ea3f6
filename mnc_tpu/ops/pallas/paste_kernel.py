"""Pallas TPU kernel: fused canvas paste-back + binarize.

The unmold step (reference ``tools/demo.py`` cv2-resize-into-box, here the
hat-matrix einsum in :func:`mnc_tpu.ops.masks.paste_masks`) produces the
single largest postprocess tensor: the (K, H, W) canvas-sized product
(K=100 detections at the 640×1024 canvas = 65 M px/img).  The working
hypothesis (STATUS r4 "identified headroom") was that the XLA einsum
materializes that product in HBM and re-reads it for the ``> thresh``
binarize — ~260 MB/img of round-trip traffic whose only consumer is a
compare (postprocess profiled at 56% of HBM peak with 2% MFU,
docs/results/profile_mfu_r4.jsonl).  This kernel was built to test that
hypothesis; the measurement below REFUTED it.

This kernel fuses the whole chain: per detection, both hat matmuls run in
VMEM at f32 and only the binarized boolean canvas is ever written to HBM —
the float product never exists outside the core.

**Measured result (v5e, K=100 @ 28², 640×1024): the einsum WINS — this
kernel is a validated non-default.**  einsum+binarize 0.859 ms vs 0.909–
1.015 ms for every kernel variant (f32/bf16 × h_tile None/320/128).  Two
reasons, both confirmed by XLA cost analysis of the einsum program
(91 MB accessed, 4.0 GFLOP):
1. XLA already fuses the ``> thresh`` compare into the einsum epilogue —
   the feared ~260 MB canvas-product round-trip does not exist; traffic is
   just hats in + bool canvas out, the same as this kernel's.
2. The hat matmuls are skinny (contraction dim M=28 ≪ the 128-lane MXU
   tile), so the kernel pays Mosaic relayout/padding overhead the XLA
   fusion avoids.
Kept behind ``TEST.PASTE_IMPL=pallas`` for chips/canvases where the
fusion trade flips (same precedent as roi_warp_pallas / nms_pallas).

Design notes:
- The hat weights (wy, wxᵀ) are computed OUTSIDE the kernel by the exact
  same :func:`mnc_tpu.ops.masks` code the einsum path uses (19 MB/img —
  negligible traffic), so the two implementations share every geometric
  convention and the kernel has no scalar (SMEM) inputs — which keeps it
  trivially vmap-able over the image batch (Pallas lifts the batch to a
  leading grid dimension).
- f32 accumulation throughout (all intermediates are VMEM-resident, so the
  bf16-traffic trade the einsum path makes is unnecessary here).  The
  binarize margin argument (PARITY_FIXTURES.md) covers both: mask values
  straddle 0.4 by ≫ bf16 eps on trained models, so the implementations
  agree bitwise on the boolean output.
- One program per detection: the (H, W) f32 product (2.6 MB at 640×1024)
  plus the (H, M)/(M, W) hats fit VMEM comfortably for every MNC canvas;
  ``h_tile`` optionally splits the canvas rows across grid programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _paste_kernel(wy_ref, masks_ref, wxt_ref, out_ref, *, thresh, dtype):
    # blocks: wy (1, TH, M), mask (1, M, M), wxt (1, M, W) -> out (1, TH, W)
    t1 = jnp.dot(wy_ref[0].astype(dtype), masks_ref[0].astype(dtype),
                 preferred_element_type=jnp.float32)  # (TH, M)
    prod = jnp.dot(t1.astype(dtype), wxt_ref[0].astype(dtype),
                   preferred_element_type=jnp.float32)  # (TH, W) — VMEM only
    out_ref[0] = prod > thresh


def paste_binarize_pallas(
    wy: jnp.ndarray,
    masks: jnp.ndarray,
    wxt: jnp.ndarray,
    thresh: float,
    dtype=jnp.float32,
    h_tile: int | None = None,
) -> jnp.ndarray:
    """(N, H, M) hats × (N, M, M) masks × (N, M, W) hatsᵀ → bool (N, H, W).

    The fused equivalent of
    ``einsum("nhp,npq,nqw->nhw", wy, masks, wxt) > thresh`` with the
    canvas-sized product kept in VMEM.

    dtype: matmul input dtype (f32 exact; bf16 = the einsum path's trade,
      legal because mask values straddle the threshold by ≫ bf16 eps).
    h_tile: canvas rows per program (must divide H); None = whole canvas.
    """
    n, h, m = wy.shape
    w = wxt.shape[-1]
    th = h if h_tile is None else h_tile
    assert h % th == 0, (h, th)
    kernel = functools.partial(_paste_kernel, thresh=float(thresh),
                               dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, m), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.bool_),
        # Tests run on a forced-CPU mesh; interpret mode keeps them meaningful.
        interpret=jax.default_backend() != "tpu",
    )(wy.astype(jnp.float32), masks.astype(jnp.float32),
      wxt.astype(jnp.float32))
