"""Loss functions with reference (Caffe) semantics.

- ``smooth_l1_loss``: port of ``caffe-mnc/src/caffe/layers/smooth_L1_loss_layer.{cpp,cu}``
  — Huber loss with per-coordinate *inside* weights (multiply the diff; encode
  fg-only regression) and *outside* weights (multiply the loss; encode 1/N
  normalization), exactly the contract the reference's target layers emit.
- ``softmax_cross_entropy``: Caffe SoftmaxWithLoss with ``ignore_label=-1``
  semantics (used by the RPN cls loss over 256 sampled anchors; ignored anchors
  contribute neither loss nor normalization).
- ``sigmoid_cross_entropy``: Caffe SigmoidCrossEntropyLoss (mask loss, fg RoIs
  only via a per-RoI weight).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1_loss(
    pred: jnp.ndarray,
    targets: jnp.ndarray,
    inside_weights: jnp.ndarray | None = None,
    outside_weights: jnp.ndarray | None = None,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """SmoothL1 (Huber): sum over all elements of outside_w * huber(inside_w * diff).

    huber(x) = 0.5 * (sigma*x)^2        if |x| < 1/sigma^2
             = |x| - 0.5/sigma^2        otherwise

    Matches the Caffe layer: normalization is entirely the caller's business via
    outside_weights (the reference passes e.g. 1/N_reg there).
    """
    diff = pred - targets
    if inside_weights is not None:
        diff = diff * inside_weights
    sigma2 = sigma * sigma
    abs_diff = jnp.abs(diff)
    loss = jnp.where(
        abs_diff < 1.0 / sigma2,
        0.5 * sigma2 * diff * diff,
        abs_diff - 0.5 / sigma2,
    )
    if outside_weights is not None:
        loss = loss * outside_weights
    return jnp.sum(loss)


def softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = -1,
    normalize: bool = True,
) -> jnp.ndarray:
    """Softmax CE over the last axis with Caffe ignore-label semantics.

    Args:
      logits: (..., C).
      labels: (...,) int; entries equal to ``ignore_label`` contribute neither
        loss nor count.
      normalize: divide by the number of non-ignored entries (Caffe
        ``normalization: VALID``, the reference's RPN/cls setting).
    """
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    total = jnp.sum(nll)
    if normalize:
        count = jnp.maximum(jnp.sum(valid.astype(logits.dtype)), 1.0)
        return total / count
    return total


def sigmoid_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    normalize_by_weights: bool = True,
) -> jnp.ndarray:
    """Elementwise sigmoid CE; ``weights`` broadcasts (per-RoI fg mask).

    Stable formulation: max(x,0) - x*t + log(1 + exp(-|x|)).
    With ``normalize_by_weights``, returns the mean over *weighted* elements
    (sum(loss * w) / max(sum(w), 1)) — so padded / background RoIs contribute
    neither loss nor normalization, matching the reference's fg-only mask loss.
    """
    x, t = logits, targets
    loss = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weights is not None:
        w = jnp.broadcast_to(weights, logits.shape).astype(logits.dtype)
        loss = loss * w
        if normalize_by_weights:
            return jnp.sum(loss) / jnp.maximum(jnp.sum(w), 1.0)
        return jnp.sum(loss)
    return jnp.mean(loss)
