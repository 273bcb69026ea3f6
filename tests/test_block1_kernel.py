"""Fused VGG block-1 Pallas kernel vs the XLA path.

The kernel (ops/pallas/block1_kernel.py) must reproduce the flax
nn.Conv(dtype=bf16) numerics at every rounding point; the only legal
deviation is f32 re-association before the bf16 round (≤ 1 bf16 ulp).
Runs in interpret mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mnc_tpu.ops.pallas.block1_kernel import (
    block1_reference,
    fused_block1,
)

BF16_ULP = 2.0 ** -7  # relative: 1 ulp of the bf16 mantissa


def _params(rng):
    w1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32))
    w2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32))
    return w1, b1, w2, b2


def _assert_ulp_close(got, ref):
    d = np.abs(got - ref)
    tol = BF16_ULP * np.maximum(np.abs(ref), 1.0)
    assert (d <= tol).all(), f"max dev {d.max()} vs tol {tol[d.argmax()]}"


def test_block1_kernel_matches_reference(rng):
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 50)
    p = _params(np.random.RandomState(7))
    ref = np.asarray(block1_reference(x, *p), np.float32)
    for tph in (2, 4, 8):
        got = np.asarray(fused_block1(x, *p, tph), np.float32)
        assert got.shape == (2, 16, 16, 64)
        _assert_ulp_close(got, ref)


def test_block1_kernel_edge_zero_padding(rng):
    """conv1_2's SAME pad is zero on conv1_1's OUTPUT — a constant image
    makes any halo mistake (relu(b1) leaking in) visible at the borders."""
    p = _params(np.random.RandomState(3))
    x = jnp.full((1, 16, 16, 3), 7.0, jnp.float32)
    ref = np.asarray(block1_reference(x, *p), np.float32)
    got = np.asarray(fused_block1(x, *p, 4), np.float32)
    _assert_ulp_close(got, ref)


def test_block1_kernel_grads_delegate(rng):
    p = _params(np.random.RandomState(5))
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))

    def loss_fused(x, *p):
        return jnp.sum(fused_block1(x, *p).astype(jnp.float32) ** 2)

    def loss_ref(x, *p):
        return jnp.sum(block1_reference(x, *p).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, *p)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, *p)
    for a, b in zip(gf, gr):
        # fwd outputs differ by <=1 bf16 ulp -> the squared-loss cotangents
        # differ proportionally; the VJP rule itself is the reference's
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.05, atol=1e-2)


def test_trunk_fused_block1_param_tree_and_output(rng):
    from mnc_tpu.models.vgg import VGG16Trunk

    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32) * 10)
    base = VGG16Trunk()
    fused = VGG16Trunk(fused_block1=True)
    params = base.init(jax.random.PRNGKey(0), x)
    p2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, p2)

    a = np.asarray(base.apply(params, x), np.float32)
    b = np.asarray(fused.apply(params, x), np.float32)
    # 1-ulp block-1 deviations propagate through 11 more bf16 conv layers
    np.testing.assert_allclose(a, b, rtol=0.15, atol=0.05)


def test_trunk_fused_block1_shape_fallback(rng):
    """H not divisible by 8 silently uses the unfused path."""
    from mnc_tpu.models.vgg import VGG16Trunk

    x = jnp.asarray(rng.randn(1, 20, 16, 3).astype(np.float32))
    fused = VGG16Trunk(fused_block1=True)
    params = fused.init(jax.random.PRNGKey(0), x)
    got = np.asarray(fused.apply(params, x))
    want = np.asarray(VGG16Trunk().apply(params, x))
    np.testing.assert_array_equal(got, want)  # identical program, no kernel
