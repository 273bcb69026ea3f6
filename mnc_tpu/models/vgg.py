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

# (name, channels) per block; pools come between blocks.
_VGG16_BLOCKS: Sequence[Sequence[tuple[str, int]]] = (
    (("conv1_1", 64), ("conv1_2", 64)),
    (("conv2_1", 128), ("conv2_2", 128)),
    (("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256)),
    (("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512)),
    (("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512)),
)


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

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        x = x.astype(self.compute_dtype)
        for b, block in enumerate(_VGG16_BLOCKS):
            for name, ch in block:
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
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if b < self.frozen_blocks:
                x = jax.lax.stop_gradient(x)
        return x[0] if squeeze else x
