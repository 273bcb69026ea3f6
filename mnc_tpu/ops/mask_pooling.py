"""Mask pooling — ≙ ``caffe-mnc/src/caffe/layers/mask_pooling_layer.{cpp,cu}``.

Elementwise product of RoI features with the (resized, sigmoid) predicted
mask; gradients flow to BOTH inputs (the cascade's stage-3 classification
gradient reaches the stage-2 mask head through this op).  On TPU this is a
plain fused XLA multiply — no kernel needed — but it is kept as a named
function so parity tests and the model graph mirror the reference layer.
"""

from __future__ import annotations

import jax.numpy as jnp


def mask_pooling(features: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """features (N, H, W, C) * masks (N, H, W) -> (N, H, W, C)."""
    return features * masks[..., None].astype(features.dtype)
