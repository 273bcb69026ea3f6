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


def test_resnet_frozen_stage_blocks_grads():
    trunk = ResNetTrunk(depth=50, compute_dtype=jnp.float32, frozen_stages=1)
    x = jnp.ones((32, 32, 3))
    params = trunk.init(jax.random.PRNGKey(0), x)

    g = jax.grad(lambda p: jnp.sum(trunk.apply(p, x) ** 2))(params)
    # stem conv frozen → zero grads
    assert np.abs(np.asarray(g["params"]["conv1"]["kernel"])).sum() == 0
    # later stages train
    assert np.abs(np.asarray(
        g["params"]["stage4_block0"]["conv1"]["kernel"])).sum() > 0
