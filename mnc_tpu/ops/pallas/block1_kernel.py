"""Pallas TPU kernel: fused VGG block 1 (conv1_1 → relu → conv1_2 → relu →
2×2 max pool) with all intermediates in VMEM.

Why this block (reference ``models/VGG16/mnc_5stage/test.prototxt†`` conv1_*
+ pool1, executed by Caffe's cuDNN path): at the 640×1024 canvas it is the
most expensive and least efficient piece of the trunk — 1.25 ms/img of the
3.41 ms trunk at only 25% MFU (docs/results/trunk_layers_r4.jsonl), with
XLA cost analysis charging ~0.77 GB/img of HBM traffic against ~0.34 GB of
actual activations (SAME-padding copies + the full-resolution (H, W, 64)
intermediates written and re-read between layers).

Design (see DESIGN.md round-4 notes):
- Grid (B, H/2/TPH): each program produces TPH pooled rows of the final
  (B, H/2, W/2, 64) output and holds every intermediate for its row band in
  VMEM.  The input halo (2·TPH+4 image rows per band) is delivered without
  overlapping BlockSpecs by passing the padded image twice — a main
  (2·TPH)-row block plus a 4-row halo block whose block index is
  ``r·TPH/2 + TPH/2`` (integral for even TPH).
- conv1_1 as ONE im2col matmul: the padded image arrives planar
  (B, 3, Hp, Wp) (3-channel NHWC would lane-pad 43×); the kernel builds the
  (rows, W+2, 27) patch tensor with 27 cheap shifted-slice writes and runs a
  single K=27 f32-accumulated dot — 2.4 GF at ~21% pad efficiency is
  0.06 ms/img, i.e. conv1_1 is free once its HBM round-trip is gone.
- conv1_2 as ONE K=192 matmul + 3 shifted adds: the dy taps and input
  channels pack into the contraction (U3 = concat of 3 dy-shifted O1 bands,
  K = 3·64) against a (192, 192) weight whose N stacks the 3 dx taps'
  output blocks; out[w] = Σ_dx T[w+dx, dx-block].  All 576 taps accumulate
  in ONE f32 dot + 2 f32 adds — vs XLA's measured 25% MFU, this shape pads
  to 56% ((192/256)²) with no HBM traffic at all.
- Numerics mirror the flax path exactly at every rounding point (bf16 dot
  inputs, f32 accumulation, round to bf16, add bf16 bias, bf16 relu/pool);
  the only deviation is f32 re-association before the bf16 round, i.e.
  ≤1 bf16 ulp (asserted in tests/test_block1_kernel.py).

Gradients: block 1 is frozen in the reference recipe (lr_mult 0 →
``frozen_blocks≥1`` here) so the backward is rarely live; a custom VJP
delegates to :func:`block1_reference` (same precedent as roi_warp_pallas).

**PARKED — real-TPU validation failed (round 5, tools/pallas_tpu_check.py,
docs/results/block1_r5.jsonl).**  Three independent findings on v5e at the
shipped 640×1024 canvas:

1. tph=4 does not COMPILE: the f32 dot accumulators scale with tph·W and
   need 18.4 MB scoped VMEM vs the 16 MB limit.
2. At tph=2 the COMPILED kernel's output diverges from the oracle by up to
   0.36 relative (interpret mode matches to 1 bf16 ulp — a Mosaic
   compiled-vs-interpret divergence, the same failure class as the
   round-2 float-iota bug; not yet bisected).
3. Even ignoring numerics, tph=2 measures 2.40 ms/img vs XLA's 1.38 at
   batch 16 — the row band is too small to amortize the grid overhead,
   and the "~0.5 ms headroom" estimate from the r4 roofline is refuted:
   XLA's block 1 already runs closer to the wall than the cost model
   assumed.

NET.FUSED_BLOCK1 stays False.  The interpret-mode tests below remain green
and pin the INTENDED semantics so a future platform fix can be validated
by simply re-running tools/pallas_tpu_check.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def block1_reference(x: jnp.ndarray, w1, b1, w2, b2,
                     compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Pure-jnp block 1 with flax ``nn.Conv(dtype=bf16)`` numerics:
    (B, H, W, 3) → (B, H/2, W/2, 64).  The VJP target and test oracle."""
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(v, w, b):
        dnn = lax.conv_dimension_numbers(v.shape, w.shape, dn)
        y = lax.conv_general_dilated(
            v.astype(compute_dtype), w.astype(compute_dtype), (1, 1), "SAME",
            dimension_numbers=dnn)
        return jax.nn.relu(y + b.astype(compute_dtype))

    y = conv(conv(x.astype(compute_dtype), w1, b1), w2, b2)
    b_, h, w_, c = y.shape
    y = y.reshape(b_, h // 2, 2, w_ // 2, 2, c)
    return y.max(axis=(2, 4))


def _pack_w1(w1: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, 64) → (9, 192): rows k = dy·3 + c, cols n = dx·64 + o."""
    return jnp.transpose(w1, (0, 2, 1, 3)).reshape(9, 192)


def _pack_w2(w2: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 64, 64) → (192, 192): rows k = dy·64 + c, cols n = dx·64 + o."""
    # w2[dy, dx, c, o] -> [dy, c, dx, o]
    return jnp.transpose(w2, (0, 2, 1, 3)).reshape(192, 192)


def _block1_kernel(xm_ref, xh_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                   *, tph, w, h):
    cd = jnp.bfloat16
    rows1 = 2 * tph + 2  # conv1_1 output rows (incl. conv1_2 dy halo)
    # full input band: (2·TPH + 4, Wp, 3) channels-last — the im2col pieces
    # then CONCATENATE along the existing lane dim (a minor-dim insertion,
    # as a channels-planar stack would need, is an unsupported relayout).
    x = jnp.concatenate([xm_ref[0], xh_ref[0]], axis=0)

    # Working width: conv1_1 output needs W+2 columns (conv1_2's x halo);
    # rounded up to a sublane-tile multiple so the (rows, wu, K) →
    # (rows·wu, K) matmul reshapes are tile-aligned (Mosaic requirement).
    wu = -(-(w + 2) // 8) * 8

    # conv1_1 — same shape trick as conv1_2 below: dy and channel pack into
    # the contraction (K = 3·3 = 9), the dx taps into N (192 = 3·64), and
    # the dx spatial offsets become shifted slice-ADDS after the dot (lane
    # concats of sublane-offset slices are unsupported; offset operands of
    # elementwise adds relayout fine).  u1's dy pieces share offset 0.
    wp = x.shape[1]
    u1 = jnp.concatenate([x[dy:dy + rows1, :, :] for dy in range(3)],
                         axis=-1)  # (rows1, Wp, 9)
    t1 = jnp.dot(u1.reshape(-1, 9).astype(cd), w1_ref[...].astype(cd),
                 preferred_element_type=jnp.float32)
    t1 = t1.reshape(rows1, wp, 192)
    s1 = (t1[:, 0:wu, 0:64] + t1[:, 1:wu + 1, 64:128]
          + t1[:, 2:wu + 2, 128:192])
    o1 = jax.nn.relu(s1.astype(cd) + b1_ref[...].astype(cd))
    # conv1_2's SAME padding in the reference is ZERO on conv1_1's OUTPUT;
    # the halo rows/cols of o1 sit outside the image (where relu(0·w + b1)
    # ≠ 0), so zero them to match (o1 row j ↔ image row r·2TPH - 1 + j,
    # col k ↔ image col k - 1).
    r0 = pl.program_id(1) * 2 * tph
    # 3-D iotas at full lane width (a minor-dim insertion on a narrow mask
    # is unsupported in Mosaic)
    col = lax.broadcasted_iota(jnp.int32, (rows1, wu, 64), 1)
    row_img = lax.broadcasted_iota(jnp.int32, (rows1, wu, 64), 0) + (r0 - 1)
    keep = (col > 0) & (col < w + 1) & (row_img >= 0) & (row_img < h)
    o1 = jnp.where(keep, o1, jnp.zeros((), cd))

    # conv1_2: dy+channel packed contraction (rows2, wu, 192) @ (192, 192)
    rows2 = 2 * tph
    u3 = jnp.concatenate([o1[dy:dy + rows2] for dy in range(3)], axis=-1)
    t2 = jnp.dot(u3.reshape(-1, 192).astype(cd), w2_ref[...].astype(cd),
                 preferred_element_type=jnp.float32)
    t2 = t2.reshape(rows2, wu, 192)
    s = (t2[:, 0:w, 0:64] + t2[:, 1:w + 1, 64:128] + t2[:, 2:w + 2, 128:192])
    o2 = jax.nn.relu(s.astype(cd) + b2_ref[...].astype(cd))

    # 2×2 max pool — reshape+reduce (strided slices lower to unsupported
    # gathers in Mosaic; these reshapes only split sublane dims)
    mr = o2.reshape(tph, 2, w, 64).max(axis=1)          # (TPH, W, 64)
    out_ref[0] = mr.reshape(tph, w // 2, 2, 64).max(axis=2)  # (TPH, W/2, 64)


def _block1_pallas_raw(x: jnp.ndarray, w1, b1, w2, b2,
                       tph: int = 2) -> jnp.ndarray:
    """(B, H, W, 3) bf16-castable image → (B, H/2, W/2, 64) bf16."""
    b, h, w, _ = x.shape
    assert h % (2 * tph) == 0 and tph % 2 == 0 and w % 2 == 0, (h, w, tph)
    xb = x.astype(jnp.bfloat16)
    # SAME padding = 2 px each side; the right edge is padded further so the
    # padded width Wp = wu + 8 is itself a sublane-tile multiple (the
    # kernel's (rows·Wp, 9) reshape requires it), with wu = W+2 rounded up.
    # Channels-last: the HBM array stays compact; only the kernel's small
    # row-band VMEM blocks pay the 3→128 lane pad.
    wu = -(-(w + 2) // 8) * 8
    xp = jnp.pad(xb, ((0, 0), (2, 2), (2, wu - w + 6), (0, 0)))
    n_tiles = h // (2 * tph)

    kernel = functools.partial(_block1_kernel, tph=tph, w=w, h=h)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            # main band: rows [r·2TPH, r·2TPH + 2TPH)
            pl.BlockSpec((1, 2 * tph, wu + 8, 3), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            # halo band: rows [r·2TPH + 2TPH, +4) — a 4-row block at index
            # (tph/2)·(r+1); rows are a third-minor dim so the 8-sublane
            # block constraint does not apply.
            pl.BlockSpec((1, 4, wu + 8, 3),
                         lambda i, r, _t=tph: (i, (r + 1) * (_t // 2), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 192), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((192, 192), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tph, w // 2, 64),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, 64), jnp.bfloat16),
        interpret=jax.default_backend() != "tpu",
    )(xp, xp, _pack_w1(jnp.asarray(w1)), jnp.asarray(b1).reshape(1, 64),
      _pack_w2(jnp.asarray(w2)), jnp.asarray(b2).reshape(1, 64))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_block1(x, w1, b1, w2, b2, tph: int = 2):
    """Fused block 1 (pallas fwd, reference VJP): (B, H, W, 3) → pooled."""
    return _block1_pallas_raw(x, w1, b1, w2, b2, tph=tph)


def _fb1_fwd(x, w1, b1, w2, b2, tph):
    return fused_block1(x, w1, b1, w2, b2, tph), (x, w1, b1, w2, b2)


def _fb1_bwd(tph, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(lambda *a: block1_reference(*a), x, w1, b1, w2, b2)
    return vjp(g.astype(jnp.bfloat16))


fused_block1.defvjp(_fb1_fwd, _fb1_bwd)
