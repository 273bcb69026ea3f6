"""CFM path: classify precomputed segments through trunk + classify head."""

import jax
import jax.numpy as jnp
import numpy as np

from mnc_tpu.models.cfm import cfm_apply
from mnc_tpu.models.mnc import MNC, MNCArch

ARCH = MNCArch(canvas=(64, 96), anchor_scales=(1, 2, 4), num_classes=4,
               mask_size=9, warp_hw=4, n_stages=3, compute_dtype=jnp.float32,
               fc_dim=32, mask_fc_dim=16, pre_nms_top_n=32, post_nms_top_n=8,
               rpn_min_size=4.0)


def test_cfm_apply_shapes_and_probs():
    model = MNC(arch=ARCH)
    img = jnp.zeros((*ARCH.canvas, 3), jnp.float32)
    info = jnp.array([64.0, 96.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, info)

    rs = np.random.RandomState(0)
    n = 6
    boxes = np.stack([
        rs.uniform(0, 40, n), rs.uniform(0, 30, n),
        rs.uniform(50, 90, n), rs.uniform(40, 60, n)], axis=1).astype(np.float32)
    masks = (rs.uniform(size=(n, 9, 9)) > 0.5).astype(np.float32)
    valid = np.ones(n, bool)

    out = jax.jit(lambda p, im, ii, b, m, v: cfm_apply(model, p, im, ii, b, m, v))(
        params, jnp.asarray(rs.randn(*ARCH.canvas, 3).astype(np.float32)),
        info, jnp.asarray(boxes), jnp.asarray(masks), jnp.asarray(valid))
    assert out["cls_prob"].shape == (n, 4)
    np.testing.assert_allclose(np.asarray(out["cls_prob"]).sum(-1), 1.0, atol=1e-3)
    assert out["boxes"].shape == (n, 4)
    b = np.asarray(out["boxes"])
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 95).all()
