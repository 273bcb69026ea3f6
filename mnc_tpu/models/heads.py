"""Cascade heads: RPN, mask regression, mask-weighted classification.

These are the learned pieces of the reference prototxt graph
(``models/VGG16/mnc_5stage/{train_val,test}.prototxt``):

- ``RPNHead`` ≙ rpn_conv/3x3 → rpn_cls_score (2A ch) + rpn_bbox_pred (4A ch).
- ``MaskHead`` ≙ fc layer pair on the 14×14 warped RoI features → 256 →
  MASK_SIZE² mask logits (stage 2; weights shared with stage 4).
- ``ClassifyHead`` ≙ mask pooling → 2×2 max pool → fc6/fc7 (4096) →
  cls_score (C) + bbox_pred (4C) (stage 3; weights shared with stage 5).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mnc_tpu.ops.mask_pooling import mask_pooling


class RPNHead(nn.Module):
    num_anchors: int = 9
    mid_channels: int = 512
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feat: jnp.ndarray):
        """feat (…, Hf, Wf, C) → cls logits (…, Hf, Wf, 2A), bbox (…, Hf, Wf, 4A)."""
        x = feat.astype(self.compute_dtype)
        x = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                    dtype=self.compute_dtype, param_dtype=jnp.float32,
                    name="rpn_conv")(x)
        x = nn.relu(x)
        cls = nn.Conv(2 * self.num_anchors, (1, 1), dtype=self.compute_dtype,
                      param_dtype=jnp.float32, name="rpn_cls_score")(x)
        bbox = nn.Conv(4 * self.num_anchors, (1, 1), dtype=self.compute_dtype,
                       param_dtype=jnp.float32, name="rpn_bbox_pred")(x)
        return cls.astype(jnp.float32), bbox.astype(jnp.float32)


class MaskHead(nn.Module):
    mask_size: int = 21
    fc_dim: int = 256
    compute_dtype: jnp.dtype = jnp.bfloat16
    # TEST.INT8: fc_mask (the wide 14·14·C → fc_dim matmul) on the int8 MXU
    # path; mask_pred stays float for logit fidelity.
    int8: bool = False

    @nn.compact
    def __call__(self, roi_feat: jnp.ndarray) -> jnp.ndarray:
        """(N, 14, 14, C) warped features → (N, M, M) mask LOGITS."""
        n = roi_feat.shape[0]
        x = roi_feat.astype(self.compute_dtype).reshape(n, -1)
        if self.int8:
            from mnc_tpu.ops.quant import DenseInt8

            x = DenseInt8(self.fc_dim, compute_dtype=self.compute_dtype,
                          name="fc_mask")(x)
        else:
            x = nn.Dense(self.fc_dim, dtype=self.compute_dtype,
                         param_dtype=jnp.float32, name="fc_mask")(x)
        x = nn.relu(x)
        x = nn.Dense(self.mask_size * self.mask_size, dtype=self.compute_dtype,
                     param_dtype=jnp.float32, name="mask_pred")(x)
        return x.astype(jnp.float32).reshape(n, self.mask_size, self.mask_size)


class ClassifyHead(nn.Module):
    num_classes: int = 21
    fc_dim: int = 4096
    compute_dtype: jnp.dtype = jnp.bfloat16
    dropout_rate: float = 0.5
    dual_pathway: bool = False  # concat mask-pooled + raw box pathways
    pool_window: int = 2  # warp_hw // pooled_hw (NET.POOLED_HW)
    # TEST.INT8: run the fc6/fc7 matmuls (the head's FLOPs) on the int8 MXU
    # path (ops/quant.py); cls_score/bbox_pred stay float for logit fidelity.
    int8: bool = False

    @nn.compact
    def __call__(
        self,
        roi_feat: jnp.ndarray,
        soft_masks: jnp.ndarray,
        train: bool = False,
    ):
        """RoI features (N, 14, 14, C) + soft masks (N, 14, 14) → cls/bbox.

        Mask pooling (≙ MaskPoolingLayer) multiplies features by the resized
        sigmoid mask before the fc tower; gradients reach the mask head
        through it.
        """
        n = roi_feat.shape[0]
        masked = mask_pooling(roi_feat, soft_masks)
        paths = [masked, roi_feat] if self.dual_pathway else [masked]
        feats = []
        for p in paths:
            w = self.pool_window
            p = nn.max_pool(p.astype(self.compute_dtype), (w, w), strides=(w, w))
            feats.append(p.reshape(n, -1))
        x = jnp.concatenate(feats, axis=-1)
        if self.int8:
            from mnc_tpu.ops.quant import DenseInt8

            fc = lambda name: DenseInt8(self.fc_dim, name=name,  # noqa: E731
                                        compute_dtype=self.compute_dtype)
        else:
            fc = lambda name: nn.Dense(self.fc_dim,  # noqa: E731
                                       dtype=self.compute_dtype,
                                       param_dtype=jnp.float32, name=name)
        x = nn.relu(fc("fc6")(x))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(fc("fc7")(x))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        cls = nn.Dense(self.num_classes, dtype=self.compute_dtype,
                       param_dtype=jnp.float32, name="cls_score")(x)
        bbox = nn.Dense(4 * self.num_classes, dtype=self.compute_dtype,
                        param_dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.001),
                        name="bbox_pred")(x)
        return cls.astype(jnp.float32), bbox.astype(jnp.float32)
