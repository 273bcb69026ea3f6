"""torchvision ResNet state-dict import → FrozenBN numerics (VERDICT r2 weak #5).

The reference's COCO entry fine-tuned a BN-frozen ResNet-101 from ImageNet
weights (SURVEY.md §0); our FrozenBN stores the folded affine only, so the
import must fold running mean/var correctly.  These tests round-trip a
synthetic torchvision-format state dict (real ``torch.nn`` modules provide
the oracle) into :class:`mnc_tpu.models.resnet.ResNetTrunk`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mnc_tpu.models.resnet import ConvRoIHead, ResNetTrunk  # noqa: E402
from mnc_tpu.utils.weights import fold_bn, load_resnet_torchvision  # noqa: E402


def test_fold_bn_matches_torch_eval():
    rs = np.random.RandomState(0)
    c = 13
    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rs.randn(c), dtype=torch.float32))
        bn.bias.copy_(torch.tensor(rs.randn(c), dtype=torch.float32))
        bn.running_mean.copy_(torch.tensor(rs.randn(c), dtype=torch.float32))
        bn.running_var.copy_(torch.tensor(rs.uniform(0.5, 2.0, c), dtype=torch.float32))
    x = rs.randn(2, c, 5, 7).astype(np.float32)
    want = bn(torch.tensor(x)).detach().numpy()
    scale, bias = fold_bn(bn.weight.detach().numpy(), bn.bias.detach().numpy(),
                          bn.running_mean.numpy(), bn.running_var.numpy())
    got = x * scale[None, :, None, None] + bias[None, :, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class _TorchBottleneckV1(torch.nn.Module):
    """MSRA/Caffe-convention bottleneck (stride on the first 1x1) — mirrors
    our flax Bottleneck so the import mapping can be checked exactly.  The
    weight FORMAT is identical to torchvision's (v1.5) blocks; only the
    stride placement differs, which lives in the module, not the weights."""

    def __init__(self, c_in, f, stride=1, project=False, stride_in_3x3=False):
        super().__init__()
        s1, s2 = (1, stride) if stride_in_3x3 else (stride, 1)
        self.conv1 = torch.nn.Conv2d(c_in, f, 1, s1, 0, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(f)
        self.conv2 = torch.nn.Conv2d(f, f, 3, s2, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(f)
        self.conv3 = torch.nn.Conv2d(f, 4 * f, 1, 1, 0, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(4 * f)
        self.downsample = None
        if project:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(c_in, 4 * f, 1, stride, 0, bias=False),
                torch.nn.BatchNorm2d(4 * f))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + r)


class _TorchTrunkV1(torch.nn.Module):
    """Stem + layer1-3 of a depth-50 trunk, MSRA stride placement, with
    torchvision state-dict naming (conv1/bn1/layerL.i.*)."""

    def __init__(self, blocks=(3, 4, 6), features=(64, 128, 256),
                 stride_in_3x3=False):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        c_in = 64
        for li, (n, f) in enumerate(zip(blocks, features)):
            stride = 1 if li == 0 else 2
            layers = [_TorchBottleneckV1(c_in, f, stride, True, stride_in_3x3)]
            c_in = 4 * f
            layers += [_TorchBottleneckV1(c_in, f, stride_in_3x3=stride_in_3x3)
                       for _ in range(n - 1)]
            setattr(self, f"layer{li + 1}", torch.nn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        return self.layer3(self.layer2(self.layer1(x)))


def _randomize_bn_stats(module, rs):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                c = m.num_features
                m.weight.copy_(torch.tensor(rs.uniform(0.5, 1.5, c), dtype=torch.float32))
                m.bias.copy_(torch.tensor(rs.randn(c) * 0.1, dtype=torch.float32))
                m.running_mean.copy_(torch.tensor(rs.randn(c) * 0.2, dtype=torch.float32))
                m.running_var.copy_(torch.tensor(rs.uniform(0.5, 2.0, c), dtype=torch.float32))


@pytest.fixture(scope="module")
def torch_trunk():
    torch.manual_seed(3)
    net = _TorchTrunkV1().eval()
    _randomize_bn_stats(net, np.random.RandomState(4))
    return net


def test_resnet_trunk_import_exact(torch_trunk):
    """Full-trunk (stem + 13 bottlenecks) output equality vs the torch
    oracle when both see the same input (adapt_input=False)."""
    trunk = ResNetTrunk(depth=50, compute_dtype=jnp.float32, frozen_stages=0)
    x = np.random.RandomState(5).randn(1, 64, 96, 3).astype(np.float32)
    params = trunk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, params)

    sd = {k: v.detach().numpy() for k, v in torch_trunk.state_dict().items()}
    full = {"params": {"trunk": params["params"]}}
    full = load_resnet_torchvision(full, state_dict=sd, depth=50,
                                   adapt_input=False)

    got = np.asarray(trunk.apply({"params": full["params"]["trunk"]},
                                 jnp.asarray(x)))
    want = torch_trunk(torch.tensor(x).permute(0, 3, 1, 2)) \
        .permute(0, 2, 3, 1).detach().numpy()
    assert got.shape == want.shape == (1, 4, 6, 1024)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_resnet_trunk_import_exact_v15_torchvision_geometry():
    """Shipped torchvision resnets are v1.5 (stride on the 3x3).  With
    NET.RESNET_STRIDE_IN_3X3 the imported trunk must match a v1.5 torch
    oracle exactly — and the v1-geometry trunk must NOT (the silent
    feature-divergence failure the flag exists to prevent)."""
    torch.manual_seed(11)
    net = _TorchTrunkV1(stride_in_3x3=True).eval()
    _randomize_bn_stats(net, np.random.RandomState(12))
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    x = np.random.RandomState(13).randn(1, 64, 96, 3).astype(np.float32)
    want = net(torch.tensor(x).permute(0, 3, 1, 2)) \
        .permute(0, 2, 3, 1).detach().numpy()

    outs = {}
    for v15 in (True, False):
        trunk = ResNetTrunk(depth=50, compute_dtype=jnp.float32,
                            frozen_stages=0, stride_in_3x3=v15)
        params = jax.tree.map(
            np.asarray, trunk.init(jax.random.PRNGKey(0), jnp.asarray(x)))
        full = load_resnet_torchvision({"params": {"trunk": params["params"]}},
                                       state_dict=sd, depth=50,
                                       adapt_input=False)
        outs[v15] = np.asarray(trunk.apply(
            {"params": full["params"]["trunk"]}, jnp.asarray(x)))

    np.testing.assert_allclose(outs[True], want, rtol=2e-4, atol=2e-4)
    # same shapes, different features — the mismatch the flag guards against
    assert outs[False].shape == want.shape
    assert np.abs(outs[False] - want).max() > 1e-2


def test_resnet_stem_input_adaptation(torch_trunk):
    """adapt_input=True: our stem on a BGR mean-subtracted uint8 image ==
    torch's stem on the same image RGB/255-ImageNet-normalized (interior;
    the zero-pad border encodes different constants per convention)."""
    from mnc_tpu.config import cfg
    from mnc_tpu.utils.weights import _TV_MEAN, _TV_STD

    trunk = ResNetTrunk(depth=50, compute_dtype=jnp.float32, frozen_stages=0)
    rs = np.random.RandomState(6)
    img = rs.randint(0, 256, (64, 96, 3)).astype(np.float32)  # BGR uint8-ish
    x_bgr_ms = img - np.asarray(cfg.PIXEL_MEANS, np.float32).reshape(1, 1, 3)
    x_rgb_n = (img[..., ::-1] / 255.0 - _TV_MEAN) / _TV_STD

    params = trunk.init(jax.random.PRNGKey(0), jnp.asarray(x_bgr_ms[None]))
    params = jax.tree.map(np.asarray, params)
    sd = {k: v.detach().numpy() for k, v in torch_trunk.state_dict().items()}
    full = load_resnet_torchvision({"params": {"trunk": params["params"]}},
                                   state_dict=sd, depth=50, adapt_input=True)

    # stem only: conv1 + folded bn1 (relu/maxpool preserve equality)
    p = full["params"]["trunk"]
    y_ours = jax.lax.conv_general_dilated(
        jnp.asarray(x_bgr_ms[None]), jnp.asarray(p["conv1"]["kernel"]),
        window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_ours = np.asarray(y_ours) * p["bn1"]["scale"] + p["bn1"]["bias"]
    with torch.no_grad():
        y_want = torch_trunk.bn1(torch_trunk.conv1(
            torch.tensor(x_rgb_n[None], dtype=torch.float32).permute(0, 3, 1, 2)))
    y_want = y_want.permute(0, 2, 3, 1).numpy()
    # 7x7/s2 stem: border 2 output px touch the pad; compare the interior
    np.testing.assert_allclose(y_ours[:, 2:-2, 2:-2], y_want[:, 2:-2, 2:-2],
                               rtol=2e-4, atol=2e-4)
    # and the border must NOT agree (guards against a vacuous crop)
    assert np.abs(y_ours[:, 0] - y_want[:, 0]).max() > 1e-3


def test_resnet_conv5_head_import(torch_trunk):
    """layer4 → ConvRoIHead stage5 blocks (NET.ROI_CONV5 arch): every conv
    kernel and folded-BN leaf lands, and the head still runs."""
    torch.manual_seed(7)
    c_in, blocks = 1024, 3  # depth-50 layer4
    layer4 = torch.nn.Sequential(
        _TorchBottleneckV1(c_in, 512, 2, True),
        *[_TorchBottleneckV1(2048, 512) for _ in range(blocks - 1)])
    _randomize_bn_stats(layer4, np.random.RandomState(8))
    sd = {f"layer4.{k}": v.detach().numpy()
          for k, v in layer4.state_dict().items()}
    sd.update({k: v.detach().numpy() for k, v in torch_trunk.state_dict().items()})

    head = ConvRoIHead(num_classes=4, depth=50, compute_dtype=jnp.float32)
    feat = jnp.asarray(np.random.RandomState(10).randn(2, 14, 14, 1024), jnp.float32)
    masks = jnp.ones((2, 14, 14), jnp.float32)
    hp = jax.tree.map(np.asarray, head.init(jax.random.PRNGKey(1), feat, masks))

    trunk = ResNetTrunk(depth=50, compute_dtype=jnp.float32)
    tp = jax.tree.map(
        np.asarray,
        trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    full = {"params": {"trunk": tp["params"],
                       "classify_head": hp["params"]}}
    before = jax.tree.map(np.copy, full)
    out = load_resnet_torchvision(full, state_dict=sd, depth=50)
    for b in range(blocks):
        blk = out["params"]["classify_head"][f"stage5_block{b}"]
        old = before["params"]["classify_head"][f"stage5_block{b}"]
        for name, leaves in blk.items():
            for leaf, v in leaves.items():
                assert not np.allclose(v, old[name][leaf]), (b, name, leaf)
    cls, bbox = head.apply({"params": out["params"]["classify_head"]}, feat, masks)
    assert cls.shape == (2, 4) and bbox.shape == (2, 16)
    assert np.isfinite(np.asarray(cls)).all() and np.isfinite(np.asarray(bbox)).all()
