"""ResNet trunk (COCO-config backbone) — shapes, stride, cascade integration."""

import jax
import jax.numpy as jnp
import numpy as np

from mnc_tpu.models.mnc import MNC, MNCArch
from mnc_tpu.models.resnet import ResNetTrunk


def test_resnet50_stride16_shape():
    trunk = ResNetTrunk(depth=50, compute_dtype=jnp.float32)
    x = jnp.zeros((64, 96, 3))
    params = trunk.init(jax.random.PRNGKey(0), x)
    y = trunk.apply(params, x)
    assert y.shape == (4, 6, 1024)  # stride 16, C4 channels


def test_resnet_cascade_integration():
    arch = MNCArch(canvas=(64, 96), anchor_scales=(1, 2, 4), num_classes=4,
                   mask_size=9, warp_hw=4, n_stages=3, trunk="resnet50",
                   compute_dtype=jnp.float32, fc_dim=32, mask_fc_dim=16,
                   pre_nms_top_n=32, post_nms_top_n=8, rpn_min_size=4.0)
    model = MNC(arch=arch)
    img = jnp.zeros((*arch.canvas, 3), jnp.float32)
    info = jnp.array([64.0, 96.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, info)
    out = model.apply(params, img, info)
    assert out["cls_prob"].shape == (8, 4)
    assert np.isfinite(np.asarray(out["cls_prob"])).all()


def test_roi_conv5_head_cascade():
    """The reference COCO design: conv5 runs per-RoI after warping
    (MNCArch.roi_conv5).  Forward shapes hold, outputs are finite, and
    gradients reach both the conv5 stage and — through mask pooling — the
    mask head (the cascade's defining gradient path)."""
    arch = MNCArch(canvas=(64, 96), anchor_scales=(1, 2, 4), num_classes=4,
                   mask_size=9, warp_hw=4, n_stages=5, trunk="resnet50",
                   roi_conv5=True, compute_dtype=jnp.float32, fc_dim=32,
                   mask_fc_dim=16, pre_nms_top_n=32, post_nms_top_n=8,
                   rpn_min_size=4.0, trunk_frozen=0)
    model = MNC(arch=arch)
    img = jnp.ones((*arch.canvas, 3), jnp.float32) * 10
    info = jnp.array([64.0, 96.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, info)
    # the head replaced fc6/fc7 with the conv5 stage
    ch = params["params"]["classify_head"]
    assert "stage5_block0" in ch and "fc6" not in ch
    assert "bbox_pred" in ch and "cls_score" in ch  # export paths preserved

    out = model.apply(params, img, info)
    assert out["cls_prob"].shape == (8, 4)
    assert out["bbox_pred"].shape == (8, 16)
    assert np.isfinite(np.asarray(out["cls_prob"])).all()

    def loss(p):
        o = model.apply(p, img, info)
        return jnp.sum(o["cls_prob"] ** 2)

    g = jax.grad(loss)(params)
    gp = g["params"]
    # zero-gamma init (FrozenBN.zero_scale on bn3) makes each block start as
    # identity, so at init the conv kernels' grads arrive only after the bn3
    # scale moves off zero — connectivity is proven via the bn3 scale grad
    # plus the projection-path conv (bn_proj keeps scale=1).
    assert np.abs(np.asarray(
        gp["classify_head"]["stage5_block0"]["bn3"]["scale"])).sum() > 0
    assert np.abs(np.asarray(
        gp["classify_head"]["stage5_block0"]["proj"]["kernel"])).sum() > 0
    # classification gradients reach the mask head via mask pooling
    assert np.abs(np.asarray(
        gp["mask_head"]["fc_mask"]["kernel"])).sum() > 0


def test_resnet_frozen_stage_blocks_grads():
    trunk = ResNetTrunk(depth=50, compute_dtype=jnp.float32, frozen_stages=1)
    x = jnp.ones((32, 32, 3))
    params = trunk.init(jax.random.PRNGKey(0), x)

    g = jax.grad(lambda p: jnp.sum(trunk.apply(p, x) ** 2))(params)
    # stem conv frozen → zero grads
    assert np.abs(np.asarray(g["params"]["conv1"]["kernel"])).sum() == 0
    # later stages train (bn3 is zero-gamma at init, so kernel grads flow
    # through the projection path / bn3 scale — see test_roi_conv5_head_cascade)
    assert np.abs(np.asarray(
        g["params"]["stage4_block0"]["bn3"]["scale"])).sum() > 0
    assert np.abs(np.asarray(
        g["params"]["stage4_block0"]["proj"]["kernel"])).sum() > 0


def test_resnet_from_scratch_init_is_stable():
    """Zero-gamma init (FrozenBN.zero_scale on each bottleneck's bn3) keeps
    from-scratch activations bounded.  Affine-only FrozenBN carries no
    statistics, so without zero-gamma a deep trunk's activation magnitude
    grows with block count and from-scratch training NaNs (observed: COCO
    e2e ResNet-101 smoke diverged by iteration 20 at lr 0.002 —
    docs/results/coco_e2e_r5.jsonl).  With it, every block starts as
    identity: trunk output magnitude at init must stay O(input) even for
    the deepest trunk."""
    trunk = ResNetTrunk(depth=101, compute_dtype=jnp.float32, frozen_stages=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 64, 3))
    params = trunk.init(jax.random.PRNGKey(0), x)
    # every bottleneck's bn3 scale is zero at init; bn_proj stays ones
    flat = {"/".join(str(k) for k in p): v
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    bn3 = [v for k, v in flat.items() if "bn3" in k and "scale" in k]
    # trunk = stages conv2..conv4 of resnet-101: 3 + 4 + 23 = 30 bottlenecks
    assert len(bn3) == 30 and all(float(np.abs(v).max()) == 0 for v in bn3)
    out = np.asarray(trunk.apply(params, x))
    assert np.isfinite(out).all()
    # bounded: identity-start blocks can't amplify; projections are lecun
    assert float(np.abs(out).max()) < 50.0
