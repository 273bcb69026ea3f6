"""int8 inference path (TEST.INT8, ops/quant.py).

Beyond-reference feature (the Caffe MNC has no quantized inference); these
tests pin the contract that makes it safe to flip on:

- ConvInt8/DenseInt8 declare the EXACT param tree of nn.Conv/nn.Dense, so a
  float-trained checkpoint (or a --caffemodel / torchvision import) applies
  unchanged.
- Quantized outputs track the float path closely (symmetric per-channel
  weights + dynamic activation scales bound the per-layer error).
- The full 5-stage cascade runs under TEST.INT8 and produces scores that
  agree with the bf16 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from mnc_tpu.ops.quant import ConvInt8, DenseInt8


def test_conv_int8_param_tree_and_closeness():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 16, 24, 32).astype(np.float32))
    cf = nn.Conv(48, (3, 3), padding="SAME", dtype=jnp.float32,
                 param_dtype=jnp.float32, name="c")
    cq = ConvInt8(48, (3, 3), padding="SAME", compute_dtype=jnp.float32,
                  name="c")
    pf = cf.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(
        cq.init(jax.random.PRNGKey(0), x))
    yf = np.asarray(cf.apply(pf, x))
    yq = np.asarray(cq.apply(pf, x), np.float32)
    # dynamic int8: relative error bounded by the two 1/127 quant steps
    denom = np.maximum(np.abs(yf), np.percentile(np.abs(yf), 50))
    assert np.max(np.abs(yf - yq) / denom) < 0.15
    assert np.corrcoef(yf.ravel(), yq.ravel())[0, 1] > 0.999


def test_dense_int8_param_tree_and_closeness():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(8, 256).astype(np.float32))
    df = nn.Dense(64, dtype=jnp.float32, param_dtype=jnp.float32, name="d")
    dq = DenseInt8(64, compute_dtype=jnp.float32, name="d")
    pf = df.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(
        dq.init(jax.random.PRNGKey(0), x))
    yf = np.asarray(df.apply(pf, x))
    yq = np.asarray(dq.apply(pf, x), np.float32)
    denom = np.maximum(np.abs(yf), np.percentile(np.abs(yf), 50))
    assert np.max(np.abs(yf - yq) / denom) < 0.15
    assert np.corrcoef(yf.ravel(), yq.ravel())[0, 1] > 0.999


@pytest.fixture(scope="module")
def small_pair():
    from mnc_tpu.models.mnc import MNC, MNCArch

    kw = dict(canvas=(96, 128), num_classes=4, pre_nms_top_n=128,
              post_nms_top_n=32, n_stages=5)
    arch_f = MNCArch(**kw)
    arch_q = MNCArch(**kw, int8_inference=True)
    mf, mq = MNC(arch=arch_f), MNC(arch=arch_q)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(96, 128, 3).astype(np.float32) * 40)
    info = jnp.array([96.0, 128.0, 1.0])
    params = jax.jit(mf.init)(jax.random.PRNGKey(0), img, info)
    return mf, mq, params, img, info


def test_int8_cascade_param_tree_identical(small_pair):
    mf, mq, params, img, info = small_pair
    pq = jax.eval_shape(mq.init, jax.random.PRNGKey(0), img, info)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pq))


def test_int8_cascade_tracks_float_scores(small_pair):
    mf, mq, params, img, info = small_pair
    of = jax.jit(mf.apply)(params, img, info)
    oq = jax.jit(mq.apply)(params, img, info)
    cf = np.asarray(of["cls_prob"], np.float32)
    cq = np.asarray(oq["cls_prob"], np.float32)
    assert np.corrcoef(cf.ravel(), cq.ravel())[0, 1] > 0.995
    assert np.max(np.abs(cf - cq)) < 0.05


def test_from_cfg_int8_inference_only():
    from mnc_tpu import config as C
    from mnc_tpu.models.mnc import MNCArch

    old = C.cfg.TEST.INT8
    try:
        C.cfg.TEST.INT8 = True
        assert MNCArch.from_cfg(train=False).int8_inference
        assert not MNCArch.from_cfg(train=True).int8_inference
    finally:
        C.cfg.TEST.INT8 = old


def test_resnet_trunk_int8_param_tree_and_closeness():
    from mnc_tpu.models.resnet import ResNetTrunk

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 64, 96, 3).astype(np.float32) * 40)
    tf_ = ResNetTrunk(depth=50, compute_dtype=jnp.float32)
    tq = ResNetTrunk(depth=50, compute_dtype=jnp.float32, int8=True)
    pf = tf_.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(pf)
            == jax.tree_util.tree_structure(
                jax.eval_shape(tq.init, jax.random.PRNGKey(0), x)))
    yf = np.asarray(tf_.apply(pf, x))
    yq = np.asarray(tq.apply(pf, x), np.float32)
    assert np.corrcoef(yf.ravel(), yq.ravel())[0, 1] > 0.99
