"""Pretrained-weight conversion math (no downloads: random state dicts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnc_tpu.models.vgg import VGG16Trunk
from mnc_tpu.utils.weights import (
    _TV_FEATURE_IDX,
    _TV_MEAN,
    _TV_STD,
    _VGG_CAFFE_NAMES,
    caffe_conv_to_flax,
    load_vgg16_caffe_npz,
    load_vgg16_torchvision,
)


def _random_tv_state_dict(rs):
    """torchvision-layout VGG16 conv weights with random values."""
    import torch

    sd = {}
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
             (512, 512), (512, 512)]
    for idx, (ci, co) in zip(_TV_FEATURE_IDX, chans):
        sd[f"features.{idx}.weight"] = torch.tensor(
            rs.randn(co, ci, 3, 3).astype(np.float32) * 0.05)
        sd[f"features.{idx}.bias"] = torch.tensor(
            rs.randn(co).astype(np.float32) * 0.05)
    return sd


def test_caffe_conv_transpose():
    k = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    f = caffe_conv_to_flax(k)
    assert f.shape == (5, 7, 3, 2)
    assert f[1, 2, 0, 1] == k[1, 0, 1, 2]


def test_caffe_npz_loads(tmp_path, rng):
    trunk = VGG16Trunk(compute_dtype=jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), jnp.zeros((32, 32, 3)))
    arrays = {}
    chans = {"conv1_1": (3, 64)}
    prev = 3
    for name in _VGG_CAFFE_NAMES:
        co = params["params"][name]["kernel"].shape[-1]
        arrays[f"{name}_w"] = rng.randn(co, prev, 3, 3).astype(np.float32)
        arrays[f"{name}_b"] = rng.randn(co).astype(np.float32)
        prev = co
    path = str(tmp_path / "vgg.npz")
    np.savez(path, **arrays)
    merged = load_vgg16_caffe_npz(path, {"params": {"trunk": params["params"]}})
    got = merged["params"]["trunk"]["conv3_1"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(got), caffe_conv_to_flax(arrays["conv3_1_w"]))


def test_torchvision_conversion_first_layer_equivalence(rng):
    """The converted conv1_1 on BGR mean-subtracted input must equal the
    original torch conv on RGB [0,1]-ImageNet-normalized input."""
    torch = pytest.importorskip("torch")
    sd = _random_tv_state_dict(rng)

    trunk = VGG16Trunk(compute_dtype=jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), jnp.zeros((16, 16, 3)))
    merged = load_vgg16_torchvision({"params": {"trunk": params["params"]}},
                                    state_dict=sd)

    from mnc_tpu.config import cfg

    raw_bgr = rng.randint(0, 256, size=(16, 16, 3)).astype(np.float32)

    # our path: BGR - pixel_means through converted conv1_1
    x_ours = raw_bgr - np.asarray(cfg.PIXEL_MEANS, np.float32)
    k = np.asarray(merged["params"]["trunk"]["conv1_1"]["kernel"])
    b = np.asarray(merged["params"]["trunk"]["conv1_1"]["bias"])
    out_ours = jax.lax.conv_general_dilated(
        jnp.asarray(x_ours)[None], jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + b

    # torch path: RGB/255 normalized through original weights
    x_rgb = raw_bgr[..., ::-1] / 255.0
    x_norm = (x_rgb - _TV_MEAN) / _TV_STD
    xt = torch.tensor(np.transpose(x_norm, (2, 0, 1))[None].copy())
    conv = torch.nn.functional.conv2d(
        xt, sd["features.0.weight"], sd["features.0.bias"], padding=1)
    out_torch = np.transpose(conv.numpy()[0], (1, 2, 0))

    # interior only: at the zero-padded border the two input spaces pad with
    # different constants (documented conversion caveat)
    np.testing.assert_allclose(np.asarray(out_ours)[1:-1, 1:-1],
                               out_torch[1:-1, 1:-1], rtol=2e-3, atol=2e-3)
