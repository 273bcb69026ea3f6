"""ResNet trunk (stride-16, C4 feature) — the MNC COCO-challenge backbone.

The reference won COCO 2015 segmentation with ResNet-101 in place of VGG-16
(SURVEY.md §0; BASELINE.json configs[4]).  Standard bottleneck ResNet with the
detection convention: stages conv1–conv4 (stride 16) produce the shared
feature map; the conv5 stage is used as the per-RoI head (here we keep conv5
in the trunk optionally disabled and reuse the fc heads instead — flagged).

BatchNorm runs in inference mode with folded scale/bias (detection fine-tuning
freezes BN, as the original implementation did).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class FrozenBN(nn.Module):
    """Affine-only BatchNorm (frozen statistics folded into scale/bias).

    ``zero_scale`` initializes scale to 0 — used on the LAST BN of each
    bottleneck ("zero-gamma", Goyal et al. 2017) so every residual block
    starts as identity.  Without it a from-scratch ResNet-101 has no
    normalization at all (affine-only BN carries no statistics) and
    activations grow with depth until training NaNs (observed: COCO-e2e
    ResNet smoke diverged by iteration 20 at lr 0.002).  Weight imports
    overwrite the init, so fine-tuning paths are unaffected.
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    zero_scale: bool = False

    @nn.compact
    def __call__(self, x):
        scale_init = nn.initializers.zeros if self.zero_scale else nn.initializers.ones
        scale = self.param("scale", scale_init, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    """Stride placement (``stride_in_3x3``) MUST match the weight source:

    - False (default): stride on the first 1×1 — ResNet **v1**, the original
      MSRA/Caffe release geometry the reference's COCO entry used.
    - True: stride on the 3×3 — ResNet **v1.5**, what torchvision's shipped
      resnet50/101/152 checkpoints were trained with.  Importing torchvision
      weights into v1 geometry silently computes features the weights were
      never trained for (shapes all match — only the downsample point moves).
    """

    features: int
    stride: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    stride_in_3x3: bool = False
    int8: bool = False  # TEST.INT8 — convs on the int8 MXU path (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        # explicit symmetric padding (k//2 each side) — flax "SAME" pads
        # asymmetrically on even sizes at stride 2, a one-pixel shift vs the
        # torch/Caffe convention the pretrained weights were trained under
        if self.int8:
            from mnc_tpu.ops.quant import ConvInt8

            conv = lambda f, k, s, name: ConvInt8(  # noqa: E731
                f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
                use_bias=False, compute_dtype=self.dtype, name=name,
            )
        else:
            conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
                f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name=name,
            )
        s1, s2 = (1, self.stride) if self.stride_in_3x3 else (self.stride, 1)
        residual = x
        y = conv(self.features, 1, s1, "conv1")(x)
        y = nn.relu(FrozenBN(self.features, self.dtype, name="bn1")(y))
        y = conv(self.features, 3, s2, "conv2")(y)
        y = nn.relu(FrozenBN(self.features, self.dtype, name="bn2")(y))
        y = conv(self.features * 4, 1, 1, "conv3")(y)
        y = FrozenBN(self.features * 4, self.dtype, zero_scale=True, name="bn3")(y)
        if self.project:
            residual = conv(self.features * 4, 1, self.stride, "proj")(x)
            residual = FrozenBN(self.features * 4, self.dtype, name="bn_proj")(residual)
        return nn.relu(y + residual)


class ConvRoIHead(nn.Module):
    """Per-RoI conv5 classify head — the reference COCO-winning design.

    The ResNet detection convention (He et al.; MNC's COCO entry used it,
    SURVEY.md §0 + BASELINE configs[4]): the shared feature map stops at
    conv4; the conv5 stage runs PER RoI on the warped features, followed by
    global average pooling and linear cls/bbox predictors — no fc6/fc7
    tower.  Mask pooling (the MNC mask-weighting of features) happens before
    conv5, the same relative position it has before fc6 in the VGG head.

    Enabled by ``NET.ROI_CONV5`` (MNCArch.roi_conv5); shares stage-4/5
    weights exactly like the fc head.
    """

    num_classes: int = 21
    depth: int = 101
    compute_dtype: jnp.dtype = jnp.bfloat16
    stride_in_3x3: bool = False  # v1.5 geometry (torchvision) — see Bottleneck
    int8: bool = False  # TEST.INT8 — convs on the int8 MXU path (ops/quant.py)

    @nn.compact
    def __call__(self, roi_feat, soft_masks, train: bool = False):
        """(N, 14, 14, 1024) warped conv4 features + (N, 14, 14) soft masks
        → (cls_logits (N, C), bbox_pred (N, 4C))."""
        from mnc_tpu.ops.mask_pooling import mask_pooling

        x = mask_pooling(roi_feat, soft_masks).astype(self.compute_dtype)
        n_blocks = _DEPTHS[self.depth][3]
        # first block strides 2: 14×14 → 7×7 (the standard conv5 geometry)
        x = Bottleneck(512, 2, True, self.compute_dtype, self.stride_in_3x3,
                       self.int8, name="stage5_block0")(x)
        for b in range(1, n_blocks):
            x = Bottleneck(512, 1, False, self.compute_dtype, self.stride_in_3x3,
                           self.int8, name=f"stage5_block{b}")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool → (N, 2048)
        cls = nn.Dense(self.num_classes, dtype=self.compute_dtype,
                       param_dtype=jnp.float32, name="cls_score")(x)
        bbox = nn.Dense(4 * self.num_classes, dtype=self.compute_dtype,
                        param_dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.001),
                        name="bbox_pred")(x)
        return cls.astype(jnp.float32), bbox.astype(jnp.float32)


class ResNetTrunk(nn.Module):
    """conv1…conv4 (stride 16).  Output channels: 1024."""

    depth: int = 101
    compute_dtype: jnp.dtype = jnp.bfloat16
    frozen_stages: int = 1  # stop grads through conv1 (+stem), detection default
    stride_in_3x3: bool = False  # v1.5 geometry (torchvision) — see Bottleneck
    int8: bool = False  # TEST.INT8 — convs on the int8 MXU path (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        import jax

        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        x = x.astype(self.compute_dtype)
        blocks = _DEPTHS[self.depth][:3]  # stages conv2..conv4 → stride 16

        # symmetric padding, matching torch/Caffe (see Bottleneck note)
        if self.int8:
            from mnc_tpu.ops.quant import ConvInt8

            x = ConvInt8(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                         use_bias=False, compute_dtype=self.compute_dtype,
                         name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                        use_bias=False, dtype=self.compute_dtype,
                        param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(FrozenBN(64, self.compute_dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 1:
            x = jax.lax.stop_gradient(x)

        features = (64, 128, 256)
        for stage, (n_blocks, f) in enumerate(zip(blocks, features)):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(f, stride, True, self.compute_dtype,
                           self.stride_in_3x3, self.int8,
                           name=f"stage{stage + 2}_block0")(x)
            for b in range(1, n_blocks):
                x = Bottleneck(f, 1, False, self.compute_dtype,
                               self.stride_in_3x3, self.int8,
                               name=f"stage{stage + 2}_block{b}")(x)
            if self.frozen_stages >= stage + 2:
                x = jax.lax.stop_gradient(x)
        return x[0] if squeeze else x
