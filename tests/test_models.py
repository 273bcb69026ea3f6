"""Model assembly: shapes, proposal layer behavior, full cascade jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnc_tpu.models.mnc import MNC, MNCArch, propose_rois, stage_bridge
from mnc_tpu.ops.anchors import shifted_anchors

TINY = MNCArch(
    canvas=(64, 96),
    anchor_scales=(1, 2, 4),
    num_classes=6,
    mask_size=9,
    warp_hw=4,
    n_stages=5,
    compute_dtype=jnp.float32,
    fc_dim=32,
    mask_fc_dim=16,
    pre_nms_top_n=64,
    post_nms_top_n=16,
    rpn_min_size=4.0,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = MNC(arch=TINY)
    img = jnp.zeros((*TINY.canvas, 3), jnp.float32)
    im_info = jnp.array([64.0, 96.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, im_info)
    return model, params


def test_cascade_shapes(model_and_params):
    model, params = model_and_params
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(*TINY.canvas, 3).astype(np.float32))
    im_info = jnp.array([64.0, 96.0, 1.0])
    out = jax.jit(model.apply)(params, img, im_info)
    n, c, m = TINY.post_nms_top_n, TINY.num_classes, TINY.mask_size
    assert out["rois"].shape == (n, 4)
    assert out["roi_valid"].shape == (n,)
    assert out["cls_prob"].shape == (n, c)
    assert out["mask_logits"].shape == (n, m, m)
    assert out["bbox_pred"].shape == (n, 4 * c)
    # probabilities sum to 1
    np.testing.assert_allclose(np.asarray(out["cls_prob"]).sum(-1), 1.0, atol=1e-3)
    # rois inside the image
    r = np.asarray(out["rois"])
    assert (r[:, 0] >= 0).all() and (r[:, 2] <= 95).all()
    assert (r[:, 1] >= 0).all() and (r[:, 3] <= 63).all()


def test_propose_rois_prefers_high_scores():
    arch = TINY
    fh, fw = arch.feat_hw
    a = arch.num_anchors
    anchors = jnp.asarray(shifted_anchors(fh, fw, arch.feat_stride,
                                          arch.anchor_ratios, arch.anchor_scales))
    # Score one specific anchor very high, others low.  Channel layout:
    # interleaved (bg, fg) per anchor — 2a = bg, 2a+1 = fg.
    cls = np.zeros((fh, fw, 2 * a), np.float32)
    cls[..., 0::2] = 5.0  # bg logits high by default
    cls[..., 1::2] = -5.0
    hot = (1, 2, 3)  # (y, x, anchor)
    cls[hot[0], hot[1], 2 * hot[2] + 1] = 10.0
    cls[hot[0], hot[1], 2 * hot[2]] = -10.0
    bbox = np.zeros((fh, fw, 4 * a), np.float32)
    im_info = jnp.array([64.0, 96.0, 1.0])
    rois, valid, scores = propose_rois(jnp.asarray(cls), jnp.asarray(bbox),
                                       im_info, anchors, arch)
    assert bool(valid[0])
    # The winning roi decodes the hot anchor (zero deltas → clipped anchor box)
    k = (hot[0] * fw + hot[1]) * a + hot[2]
    want = np.array(jnp.clip(anchors[k], 0.0))
    want[2] = min(want[2], 95.0)
    want[3] = min(want[3], 63.0)
    np.testing.assert_allclose(np.asarray(rois[0]), want, atol=1e-4)
    assert float(scores[0]) > 0.99


def test_stage_bridge_moves_boxes():
    arch = TINY
    rois = jnp.array([[10.0, 10.0, 30.0, 30.0]])
    cls_prob = jnp.array([[0.1, 0.8, 0.05, 0.02, 0.02, 0.01]])
    bbox = np.zeros((1, 24), np.float32)
    bbox[0, 4:8] = [1.0, 0.0, 0.0, 0.0]  # class-1 dx=1 (normalized by std 0.1 → 0.1)
    out = np.asarray(stage_bridge(rois, cls_prob, jnp.asarray(bbox),
                                  jnp.array([64.0, 96.0, 1.0]), arch))
    # dx = 1 * std(0.1) = 0.1 → shift = 0.1 * w(21) = 2.1
    np.testing.assert_allclose(out[0, 0], 10.0 + 2.1, atol=1e-4)
    np.testing.assert_allclose(out[0, 1], 10.0, atol=1e-4)


def test_stage_bridge_grads_flow_to_rois_and_deltas():
    arch = TINY
    rois = jnp.array([[10.0, 10.0, 30.0, 30.0]])
    cls_prob = jnp.array([[0.1, 0.8, 0.05, 0.02, 0.02, 0.01]])
    bbox = jnp.zeros((1, 24))

    def loss(r, b):
        return jnp.sum(stage_bridge(r, cls_prob, b, jnp.array([64.0, 96.0, 1.0]), arch))

    gr, gb = jax.grad(loss, argnums=(0, 1))(rois, bbox)
    assert np.abs(np.asarray(gr)).sum() > 0
    assert np.abs(np.asarray(gb)).sum() > 0


def test_three_stage_variant(model_and_params):
    arch3 = MNCArch(**{**TINY.__dict__, "n_stages": 3})
    model = MNC(arch=arch3)
    img = jnp.zeros((*arch3.canvas, 3), jnp.float32)
    im_info = jnp.array([64.0, 96.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, im_info)
    out = model.apply(params, img, im_info)
    assert out["mask_logits"].shape == (arch3.post_nms_top_n, 9, 9)


def test_apply_batch_matches_per_image(model_and_params):
    """The batched cascade (flattened heads) must equal vmapped __call__."""
    model, params = model_and_params
    rs = np.random.RandomState(1)
    imgs = jnp.asarray(rs.randn(2, *TINY.canvas, 3).astype(np.float32))
    infos = jnp.asarray(np.tile([64.0, 96.0, 1.0], (2, 1)).astype(np.float32))
    a = jax.vmap(lambda im, ii: model.apply(params, im, ii))(imgs, infos)
    b = model.apply(params, imgs, infos, method=MNC.apply_batch)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_dual_pathway_head():
    """NET.DUAL_PATHWAY concatenates masked + box pathways before fc6."""
    arch = MNCArch(**{**TINY.__dict__, "dual_pathway": True})
    model = MNC(arch=arch)
    img = jnp.zeros((*arch.canvas, 3), jnp.float32)
    im_info = jnp.array([64.0, 96.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, im_info)
    out = model.apply(params, img, im_info)
    assert out["cls_prob"].shape == (arch.post_nms_top_n, arch.num_classes)
    # fc6 kernel sees twice the single-pathway input width
    k = params["params"]["classify_head"]["fc6"]["kernel"]
    single = (arch.warp_hw // 2) ** 2 * 512
    assert k.shape[0] == 2 * single


def test_trainable_anchor_mask_suppresses_untrained_types():
    """Anchor types with zero inside positions never appear in proposals."""
    # 64x96 canvas with scale-8 anchors: the 128+px anchors can't fit
    arch = MNCArch(**{**TINY.__dict__, "anchor_scales": (1, 2, 8)})
    mask = arch.trainable_anchor_mask()
    a = arch.all_anchors()
    na = arch.num_anchors
    h, w = arch.canvas
    inside_any = ((a[:, 0] >= 0) & (a[:, 1] >= 0) & (a[:, 2] < w) & (a[:, 3] < h))
    per_type = inside_any.reshape(-1, na).any(0)
    assert not per_type.all()  # some types really are untrainable here
    # mask repeats the per-type pattern over all positions
    np.testing.assert_array_equal(mask.reshape(-1, na)[0], per_type)
    np.testing.assert_array_equal(mask.reshape(-1, na)[-1], per_type)

    # proposals from uniform scores never select suppressed types
    fh, fw = arch.feat_hw
    cls = np.zeros((fh, fw, 2 * na), np.float32)
    bbox = np.zeros((fh, fw, 4 * na), np.float32)
    anchors = jnp.asarray(arch.all_anchors())
    rois, valid, _ = propose_rois(jnp.asarray(cls), jnp.asarray(bbox),
                                  jnp.array([64.0, 96.0, 1.0]), anchors, arch)
    # every valid roi must match a clipped TRAINABLE anchor
    av = np.array(jnp.clip(anchors, 0.0))
    av[:, 2] = np.minimum(av[:, 2], 95.0)
    av[:, 3] = np.minimum(av[:, 3], 63.0)
    rois = np.asarray(rois)[np.asarray(valid)]
    for r in rois:
        match = np.all(np.abs(av - r) < 1e-3, axis=1)
        assert match.any()
        assert mask[match].all()


def test_features_normalizes_u8_on_device(model_and_params):
    """MNC.features mean-subtracts uint8 input on device (the U8_TRANSFER
    upload modes) and is a no-op for float input: with integer PIXEL_MEANS,
    features(u8) is BIT-identical to features(u8 - means) — every entry
    point (train loss, detect variants, apply_batch) is u8-capable."""
    from mnc_tpu.config import cfg

    model, params = model_and_params
    rs = np.random.RandomState(7)
    u8 = rs.randint(0, 255, size=(*TINY.canvas, 3)).astype(np.uint8)
    saved = cfg.PIXEL_MEANS
    try:
        cfg.PIXEL_MEANS = np.array([[[103.0, 116.0, 123.0]]])
        means = np.asarray(cfg.PIXEL_MEANS, np.float32).reshape(1, 1, 3)
        f_u8 = model.apply(params, jnp.asarray(u8), method=MNC.features)
        f_f32 = model.apply(params, jnp.asarray(u8.astype(np.float32) - means),
                            method=MNC.features)
    finally:
        cfg.PIXEL_MEANS = saved
    np.testing.assert_array_equal(np.asarray(f_u8), np.asarray(f_f32))


def test_s2d_block1_exact_vs_plain_trunk():
    """NET.S2D_BLOCK1 is a pure layout rewrite: the space-to-depth block-1
    trunk (models/vgg.py::_s2d_phase_kernel) must match the plain trunk
    value- and gradient-wise on identical params (the param trees are
    interchangeable by construction)."""
    from mnc_tpu.models.vgg import VGG16Trunk

    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(1, 32, 48, 3).astype(np.float32))
    plain = VGG16Trunk(compute_dtype=jnp.float32, frozen_blocks=0)
    s2d = VGG16Trunk(compute_dtype=jnp.float32, frozen_blocks=0,
                     s2d_block1=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    # identical param trees → same init works for both
    y0 = plain.apply(params, x)
    y1 = s2d.apply(params, x)
    assert y0.shape == y1.shape == (1, 2, 3, 512)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)

    def loss(fn, p):
        return jnp.sum(fn.apply(p, x) ** 2)

    g0 = jax.grad(lambda p: loss(plain, p))(params)
    g1 = jax.grad(lambda p: loss(s2d, p))(params)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in flat0:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat1[path]), rtol=3e-3, atol=3e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_fault_dodges_off_is_selection_exact(model_and_params):
    """MNCArch.fault_dodges=False (tools/fault_repro.py's un-dodged
    composition: vmapped propose, argsort NMS, no barrier) must produce
    bit-identical apply_batch outputs — the dodges are selection-exact."""
    import dataclasses

    model, params = model_and_params
    rs = np.random.RandomState(7)
    imgs = jnp.asarray(rs.randn(2, *TINY.canvas, 3).astype(np.float32))
    infos = jnp.asarray(np.tile([64.0, 96.0, 1.0], (2, 1)).astype(np.float32))
    ref = model.apply(params, imgs, infos, method=MNC.apply_batch)
    m2 = MNC(arch=dataclasses.replace(TINY, fault_dodges=False))
    got = m2.apply(params, imgs, infos, method=MNC.apply_batch)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]),
                                      err_msg=k)
