"""RoI warp / RoI pool: einsum vs gather oracle vs Pallas kernel + gradients.

Ports the reference's GradientChecker discipline
(caffe-mnc/src/caffe/test/test_gradient_check_util.hpp): finite-difference
gradients are checked against autodiff for BOTH inputs — features and box
coordinates — the load-bearing property of MNC's roi_warping_layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from mnc_tpu.ops.roi_warp import roi_pool, roi_warp, roi_warp_ref
from tests.conftest import random_boxes

H, W, C = 12, 16, 8
SCALE = 1.0 / 4.0  # image 48x64 -> feature 12x16


@pytest.fixture
def feat(rng):
    return rng.randn(H, W, C).astype(np.float32)


@pytest.fixture
def rois(rng):
    return random_boxes(rng, 6, h=4 * H, w=4 * W, min_size=6.0)


def test_einsum_matches_gather_ref(feat, rois):
    a = np.asarray(roi_warp(feat, rois, (7, 7), SCALE))
    b = np.asarray(roi_warp_ref(feat, rois, (7, 7), SCALE))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pallas_matches_einsum(feat, rois):
    a = np.asarray(roi_warp(feat, rois, (7, 7), SCALE))
    b = np.asarray(roi_warp(feat, rois, (7, 7), SCALE, impl="pallas"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_grads_features_and_boxes(feat, rois):
    f = jnp.asarray(feat)
    r = jnp.asarray(rois)
    # Nudge rois off half-integer sampling so the hat kinks are not hit.
    r = r + 0.13
    check_grads(
        lambda f_, r_: roi_warp(f_, r_, (5, 5), SCALE), (f, r), order=1, modes=["rev"],
        atol=5e-2, rtol=5e-2,
    )


def test_box_grads_nonzero(feat, rois):
    """Box-coordinate gradients must actually flow (the MNC cascade trick)."""

    def loss(r):
        return jnp.sum(roi_warp(jnp.asarray(feat), r, (7, 7), SCALE) ** 2)

    g = jax.grad(loss)(jnp.asarray(rois) + 0.21)
    assert np.abs(np.asarray(g)).max() > 1e-3


def test_pallas_custom_vjp_matches_einsum_vjp(feat, rois):
    f = jnp.asarray(feat)
    r = jnp.asarray(rois) + 0.17

    def run(impl):
        def loss(f_, r_):
            return jnp.sum(jnp.sin(roi_warp(f_, r_, (7, 7), SCALE, impl=impl)))

        return jax.grad(loss, argnums=(0, 1))(f, r)

    gf_a, gr_a = run("einsum")
    gf_b, gr_b = run("pallas")
    np.testing.assert_allclose(np.asarray(gf_a), np.asarray(gf_b), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr_a), np.asarray(gr_b), rtol=1e-4, atol=1e-4)


def test_roi_warp_constant_map(feat, rois):
    """Warping a constant feature map returns that constant inside the map."""
    const = np.full((H, W, C), 2.5, np.float32)
    # RoI well inside the image.
    r = np.array([[8.0, 8.0, 30.0, 24.0]], np.float32)
    out = np.asarray(roi_warp(const, r, (7, 7), SCALE))
    np.testing.assert_allclose(out, 2.5, rtol=1e-5)


def test_roi_pool_simple():
    """Hand-checkable RoI pool: 4x4 map, one RoI covering it, 2x2 bins."""
    f = np.arange(16, dtype=np.float32).reshape(4, 4)[:, :, None]
    r = np.array([[0.0, 0.0, 3.0, 3.0]], np.float32)
    out = np.asarray(roi_pool(f, r, (2, 2), spatial_scale=1.0))[0, :, :, 0]
    np.testing.assert_array_equal(out, [[5.0, 7.0], [13.0, 15.0]])


def test_roi_pool_grad_to_features_only(feat, rois):
    f = jnp.asarray(feat)

    def loss(f_):
        return jnp.sum(roi_pool(f_, jnp.asarray(rois), (3, 3), SCALE))

    g = jax.grad(loss)(f)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_gather_impl_matches_einsum_values_and_grads(feat, rois):
    """impl='gather' (the low-HBM-traffic inference path, r4) must agree
    with the einsum hat-matrix formulation in values AND in gradients to
    both features and box coordinates."""
    f = jnp.asarray(feat)
    r = jnp.asarray(rois) + 0.17  # off the hat kinks

    a = np.asarray(roi_warp(f, r, (7, 7), SCALE))
    b = np.asarray(roi_warp(f, r, (7, 7), SCALE, impl="gather"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def run(impl):
        def loss(f_, r_):
            return jnp.sum(jnp.sin(roi_warp(f_, r_, (7, 7), SCALE, impl=impl)))

        return jax.grad(loss, argnums=(0, 1))(f, r)

    gf_a, gr_a = run("einsum")
    gf_b, gr_b = run("gather")
    np.testing.assert_allclose(np.asarray(gf_a), np.asarray(gf_b), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr_a), np.asarray(gr_b), rtol=1e-4, atol=1e-4)


def test_gather_impl_edge_rois(feat):
    """RoIs hanging off the map: gather's clipped taps must be weight-zeroed
    exactly like the einsum hat weights vanish out of range."""
    r = jnp.asarray(
        np.array([[-20.0, -12.0, 30.0, 20.0],          # overlaps top-left
                  [40.0, 30.0, 90.0, 70.0],             # overlaps bottom-right
                  [0.0, 0.0, 4 * W - 1.0, 4 * H - 1.0]  # exactly full image
                  ], np.float32))
    a = np.asarray(roi_warp(jnp.asarray(feat), r, (7, 7), SCALE))
    b = np.asarray(roi_warp(jnp.asarray(feat), r, (7, 7), SCALE, impl="gather"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
