"""Pallas TPU kernel for greedy NMS.

Kernel counterpart of the reference ``lib/nms/nms_kernel.cu`` (bitmask-
parallel NMS with a host-side sequential scan).  On TPU the whole scan runs
in one kernel invocation: boxes and the keep vector live in VMEM, and a
``fori_loop`` walks the score-sorted boxes, vectorizing each suppression row
over all K candidates on the VPU — the sequential dependency stays on-chip
instead of bouncing through a host loop.

The default on-device NMS (``mnc_tpu.ops.nms.nms_fixed``) uses the fixpoint
formulation, which usually wins (a handful of (K, K) matmul steps vs K vector
steps); this kernel exists as the direct kernel-for-kernel equivalent and as
a fallback shape for much larger K where the K×K matrix would not fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, k, thresh):
    x1 = boxes_ref[:, 0]
    y1 = boxes_ref[:, 1]
    x2 = boxes_ref[:, 2]
    y2 = boxes_ref[:, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]

    # Phase 1 (vectorized, like nms_kernel.cu's bitmask pass): full (K, K)
    # suppression matrix S[i, j] = "i suppresses j" in VMEM.
    iw = jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(x1[:, None], x1[None, :]) + 1.0
    ih = jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(y1[:, None], y1[None, :]) + 1.0
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    iou = inter / (area[:, None] + area[None, :] - inter)
    s_f = ((iou > thresh) & (idx[:, None] < idx[None, :])).astype(jnp.float32)

    out_ref[:] = valid_ref[:]

    # Phase 2: the sequential scan the CUDA kernel ran on the HOST runs here
    # on-chip.  Mosaic has no unaligned dynamic vector loads, so row i of S
    # and keep[i] are extracted with one-hot MXU dots instead of slicing.
    def body(i, _):
        keep_vec = out_ref[:].astype(jnp.float32)
        e = (idx == i).astype(jnp.float32)[None, :]  # (1, K) one-hot
        keep_i = jnp.dot(e, keep_vec[:, None],
                         preferred_element_type=jnp.float32)[0, 0] > 0.0
        row = jnp.dot(e, s_f, preferred_element_type=jnp.float32)[0]  # (K,)
        suppress = (row > 0.0) & keep_i
        out_ref[:] = jnp.where(suppress, 0, out_ref[:]).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("thresh",))
def nms_pallas(boxes: jnp.ndarray, valid: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes — same contract as nms_fixed."""
    k = boxes.shape[0]
    kernel = functools.partial(_nms_kernel, k=k, thresh=float(thresh))
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k,), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(boxes.astype(jnp.float32), valid.astype(jnp.int32))
    return out > 0
