"""Loss semantics (Caffe parity fixtures, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from mnc_tpu.ops.losses import sigmoid_cross_entropy, smooth_l1_loss, softmax_cross_entropy


def _np_smooth_l1(x, sigma=1.0):
    s2 = sigma * sigma
    return np.where(np.abs(x) < 1.0 / s2, 0.5 * s2 * x * x, np.abs(x) - 0.5 / s2)


def test_smooth_l1_values(rng):
    pred = rng.randn(10, 4).astype(np.float32) * 2
    tgt = rng.randn(10, 4).astype(np.float32)
    iw = (rng.uniform(size=(10, 4)) > 0.5).astype(np.float32)
    ow = rng.uniform(size=(10, 4)).astype(np.float32)
    got = float(smooth_l1_loss(pred, tgt, iw, ow, sigma=3.0))
    want = float(np.sum(ow * _np_smooth_l1(iw * (pred - tgt), 3.0)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_l1_inside_weights_gate_gradient():
    import jax

    pred = jnp.ones((4, 4))
    tgt = jnp.zeros((4, 4))
    iw = jnp.zeros((4, 4)).at[0].set(1.0)
    g = jax.grad(lambda p: smooth_l1_loss(p, tgt, iw, None))(pred)
    assert np.asarray(g)[1:].sum() == 0
    assert np.abs(np.asarray(g)[0]).sum() > 0


def test_softmax_ce_ignore_label(rng):
    logits = rng.randn(8, 3).astype(np.float32)
    labels = np.array([0, 1, 2, -1, -1, 1, 0, -1])
    got = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    # Oracle: mean NLL over the 5 valid entries.
    ex = np.exp(logits - logits.max(axis=1, keepdims=True))
    p = ex / ex.sum(axis=1, keepdims=True)
    valid = labels != -1
    want = float(np.mean(-np.log(p[valid, labels[valid]])))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_softmax_ce_all_ignored_is_zero():
    logits = jnp.ones((4, 3))
    labels = jnp.full((4,), -1)
    assert float(softmax_cross_entropy(logits, labels)) == 0.0


def test_sigmoid_ce_weighted_mean(rng):
    logits = rng.randn(6, 5).astype(np.float32)
    targets = (rng.uniform(size=(6, 5)) > 0.5).astype(np.float32)
    w = np.zeros((6, 1), np.float32)
    w[:3] = 1.0
    got = float(sigmoid_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w)))
    x, t = logits[:3], targets[:3]
    elems = np.maximum(x, 0) - x * t + np.log1p(np.exp(-np.abs(x)))
    np.testing.assert_allclose(got, float(elems.mean()), rtol=1e-4)
