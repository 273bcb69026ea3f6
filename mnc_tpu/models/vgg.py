"""VGG-16 convolutional trunk (conv1_1 … conv5_3, stride 16).

Replaces the reference's declarative prototxt trunk
(``models/VGG16/mnc_5stage/test.prototxt`` conv layers executed by Caffe's C++
``net.cpp``) with a flax module compiled by XLA.  Convolutions run in
``compute_dtype`` (bfloat16 by default) on the MXU; parameters stay float32.

Input convention preserved from the reference (``lib/utils/blob.py``): BGR
channel order, mean-pixel subtracted, NOT scaled to [0,1] — so ImageNet-era
Caffe weights convert 1:1 (see ``mnc_tpu.utils.weights``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# (name, channels) per block; pools come between blocks.
_VGG16_BLOCKS: Sequence[Sequence[tuple[str, int]]] = (
    (("conv1_1", 64), ("conv1_2", 64)),
    (("conv2_1", 128), ("conv2_2", 128)),
    (("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256)),
    (("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512)),
    (("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512)),
)


def _space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/r, W/r, r·r·C); channel index = (a·r + b)·C + c
    where (a, b) is the within-cell (row, col) phase."""
    b_, h, w, c = x.shape
    x = x.reshape(b_, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h // r, w // r, r * r * c)


def _s2d_phase_kernel(w: jnp.ndarray, a: int, b: int) -> jnp.ndarray:
    """Rearrange a 3×3 stride-1 conv kernel into the 2×2 kernel that computes
    output phase (a, b) directly in 2×2 space-to-depth layout.

    Exactness: for output row m = 2p + a and tap offset s ∈ {-1,0,1}, the
    input row m + s = 2(p + P) + α with (P, α) = divmod(a + s, 2); P spans two
    consecutive s2d rows, so the tap lands at s2d-kernel row ki = P + 1 - a
    (the phase conv is applied with padding (1-a, a) / (1-b, b)).  27 of the
    2·2·(4·Cin) kernel slots are populated; the rest stay zero.  Same scatter
    for columns with (b, t, β).
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), "s2d rewrite is for 3x3 stride-1 convs"
    k = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for s in (-1, 0, 1):
        pi, alpha = divmod(a + s, 2)
        ki = pi + 1 - a
        for t in (-1, 0, 1):
            pj, beta = divmod(b + t, 2)
            kj = pj + 1 - b
            lo = (alpha * 2 + beta) * cin
            k = k.at[ki, kj, lo:lo + cin, :].set(w[s + 1, t + 1])
    return k


def _s2d_conv(x2: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
              compute_dtype) -> jnp.ndarray:
    """3×3 stride-1 SAME conv + bias, computed entirely in 2×2 s2d layout:
    (B, H/2, W/2, 4·Cin) → (B, H/2, W/2, 4·Cout).  Bit-exact in math to the
    full-resolution conv (SAME zero padding maps to zero padding here)."""
    outs = []
    dn = lax.conv_dimension_numbers(x2.shape, (2, 2, x2.shape[-1], w.shape[-1]),
                                    ("NHWC", "HWIO", "NHWC"))
    for a in (0, 1):
        for b in (0, 1):
            k = _s2d_phase_kernel(w, a, b).astype(compute_dtype)
            y = lax.conv_general_dilated(
                x2, k, window_strides=(1, 1),
                padding=((1 - a, a), (1 - b, b)), dimension_numbers=dn)
            outs.append(y + bias.astype(compute_dtype))
    return jnp.concatenate(outs, axis=-1)


class _S2DConv(nn.Module):
    """A 3×3 stride-1 SAME conv evaluated in 2×2 space-to-depth layout.

    Parameter tree is identical to ``nn.Conv(features, (3,3))`` — kernel
    (3, 3, cin, features) + bias (features,) — so checkpoints and Caffe/
    torchvision imports are interchangeable with the full-res path."""

    cin: int
    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x2: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return _s2d_conv(x2, kernel, bias, self.compute_dtype)


class _ConvParams(nn.Module):
    """Declares ``nn.Conv``-shaped params (kernel + bias) without computing —
    lets the fused block-1 Pallas kernel consume the standard param tree."""

    cin: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class VGG16Trunk(nn.Module):
    """conv1_1…conv5_3 with 2x2 max pools after blocks 1-4 → stride-16 features.

    Call: (H, W, 3) or (B, H, W, 3) image(s) → (…, H/16, W/16, 512).
    ``frozen_blocks`` stops gradients into the first N blocks (the reference
    froze conv1–conv2 via ``lr_mult: 0`` in train.prototxt).
    """

    compute_dtype: jnp.dtype = jnp.bfloat16
    frozen_blocks: int = 2
    # int8 MXU inference path (TEST.INT8): identical param tree, convs run
    # s8×s8→s32 with dynamic activation scales (ops/quant.py). Inference only.
    int8: bool = False
    # Run block 1 (conv1_1, conv1_2, pool1) in 2×2 space-to-depth layout:
    # half resolution, 4× channels.  Exact same math (see _s2d_phase_kernel).
    # MEASURED NEGATIVE on v5e (STATUS r4): 4.31 vs 3.41 ms/img at batch 16 —
    # the phase decomposition does 16/9 the dense FLOPs and re-reads the
    # input per phase, and XLA's full-res conv1 is already compute-bound.
    # Kept as a documented layout experiment; leave False.
    s2d_block1: bool = False
    # Run block 1 as the fused Pallas kernel (conv1_1→relu→conv1_2→relu→
    # pool1 with every intermediate in VMEM — ops/pallas/block1_kernel.py).
    # Identical param tree; matches this path within 1 bf16 ulp.  Falls back
    # to the unfused path under int8/s2d/prefix-profiling or when H % 8 ≠ 0.
    fused_block1: bool = False
    # Profiling hook (tools/profile_net.py --trunk-layers): stop after the
    # first N ops (each conv+relu, and each pool, counts as one op).  -1 = 18
    # ops = the full trunk.  Prefix deltas give per-layer device time.
    # APPLY-ONLY: the early return exits mid-@nn.compact, so a truncated
    # trunk defines only a prefix of the param subtree — init() of a
    # truncated trunk is incompatible with full-trunk params.  Always init
    # with prefix_ops=-1 and apply() the full params (extra keys tolerated),
    # as tools/profile_net.py does.
    prefix_ops: int = -1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        x = x.astype(self.compute_dtype)
        ops_left = self.prefix_ops if self.prefix_ops >= 0 else 1 << 30
        start = 0
        if (self.fused_block1 and not self.int8 and not self.s2d_block1
                and self.prefix_ops < 0 and x.shape[1] % 8 == 0
                and x.shape[2] % 2 == 0):
            from mnc_tpu.ops.pallas.block1_kernel import fused_block1

            w1, b1 = _ConvParams(3, 64, name="conv1_1")()
            w2, b2 = _ConvParams(64, 64, name="conv1_2")()
            # tph=2: the f32 dot accumulators scale with tph·W — tph=4 at
            # W=1024 needs 18.4 MB scoped VMEM vs the 16 MB limit (real-TPU
            # compile OOM, r5); tph=2 fits with headroom.
            x = fused_block1(x, w1, b1, w2, b2, 2)
            if self.frozen_blocks > 0:
                x = jax.lax.stop_gradient(x)
            start = 1
        if self.s2d_block1 and not self.int8:
            assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, \
                "s2d block1 needs an even canvas"
            x2 = _space_to_depth(x, 2)
            x2 = nn.relu(_S2DConv(3, 64, compute_dtype=self.compute_dtype,
                                  name="conv1_1")(x2))
            x2 = nn.relu(_S2DConv(64, 64, compute_dtype=self.compute_dtype,
                                  name="conv1_2")(x2))
            b_, h2, w2, _ = x2.shape
            x = x2.reshape(b_, h2, w2, 4, 64).max(axis=3)  # pool1, exactly
            if self.frozen_blocks > 0:
                x = jax.lax.stop_gradient(x)
            start = 1
        for b, block in enumerate(_VGG16_BLOCKS):
            if b < start:
                continue
            for name, ch in block:
                if ops_left <= 0:
                    return x[0] if squeeze else x
                ops_left -= 1
                if self.int8:
                    from mnc_tpu.ops.quant import ConvInt8

                    x = ConvInt8(ch, (3, 3), padding="SAME",
                                 compute_dtype=self.compute_dtype,
                                 name=name)(x)
                else:
                    x = nn.Conv(
                        ch,
                        (3, 3),
                        padding="SAME",
                        dtype=self.compute_dtype,
                        param_dtype=jnp.float32,
                        name=name,
                    )(x)
                x = nn.relu(x)
            if b < 4:
                if ops_left <= 0:
                    return x[0] if squeeze else x
                ops_left -= 1
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if b < self.frozen_blocks:
                x = jax.lax.stop_gradient(x)
        return x[0] if squeeze else x
