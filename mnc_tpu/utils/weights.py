"""Pretrained-weight converters.

≙ the reference's ImageNet initialization step (``train_net.py`` loading
``VGG16.v2.caffemodel`` via ``net.copy_from``, fetched by
``data/scripts/fetch_imagenet_models.sh``).  Two sources are supported:

- a **caffe-export npz** (conv kernels (out, in, kh, kw), fc (out, in) — the
  layout a caffemodel dumps to), BGR channel order, mean-pixel input — our
  trunk keeps those conventions so conversion is a pure transpose;
- a **torchvision VGG-16 state-dict** (torch is in the image); torchvision
  models are RGB + [0,1]-normalized, so the first conv is channel-swapped and
  rescaled to accept the reference's BGR mean-subtracted inputs;
- a **torchvision ResNet-50/101/152 state-dict** for the COCO-entry trunk
  (SURVEY.md §0): BatchNorm running statistics are folded into the FrozenBN
  affine (scale = γ/√(σ²+ε), bias = β − μ·scale), matching the reference's
  frozen-BN detection fine-tuning; ``layer4`` maps onto the per-RoI conv5
  head when ``NET.ROI_CONV5`` is on.
"""

from __future__ import annotations

import numpy as np

_VGG_CAFFE_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
]

# torchvision vgg16.features indices of the conv layers, in order
_TV_FEATURE_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]

# ImageNet RGB normalization used by torchvision
_TV_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_TV_STD = np.array([0.229, 0.224, 0.225], np.float32)


def caffe_conv_to_flax(kernel_oihw: np.ndarray) -> np.ndarray:
    """Caffe (O, I, kH, kW) → flax (kH, kW, I, O)."""
    return np.transpose(kernel_oihw, (2, 3, 1, 0))


def load_vgg16_caffe_npz(path: str, params: dict) -> dict:
    """Merge a caffe-export npz ({name}_w / {name}_b arrays) into params."""
    import copy

    params = copy.deepcopy(params)
    with np.load(path) as data:
        for name in _VGG_CAFFE_NAMES:
            w = caffe_conv_to_flax(data[f"{name}_w"]).astype(np.float32)
            b = data[f"{name}_b"].astype(np.float32)
            dst = params["params"]["trunk"][name]
            assert dst["kernel"].shape == w.shape, (name, dst["kernel"].shape, w.shape)
            dst["kernel"], dst["bias"] = w, b
    return params


def load_vgg16_torchvision(params: dict, state_dict=None, weights_path: str | None = None) -> dict:
    """Merge torchvision VGG-16 conv weights into params (trunk only).

    Input-convention adaptation for conv1_1: torchvision expects
    RGB, x/255 normalized by ImageNet mean/std; the MNC convention is BGR
    with mean-pixel subtracted (range ~[-128, 151]).  For y = W·(x_n) + b with
    x_n = ((x_rgb/255) - m)/s and x_bgr_ms = x_bgr - pixel_means:
        W' = W[:, ::-1] / (255·s),  b' = b + W·(pixel_means_rgb/255 - m)/s · 1
    applied per input channel.  Exact on the interior; at the zero-padded
    1-pixel border the two conventions pad with different effective
    constants (negligible for detection).
    """
    import copy

    if state_dict is None:
        import torch

        assert weights_path, "state_dict or weights_path required"
        state_dict = torch.load(weights_path, map_location="cpu")
    params = copy.deepcopy(params)

    from mnc_tpu.config import cfg

    pixel_means_bgr = np.asarray(cfg.PIXEL_MEANS, np.float32).reshape(3)

    for name, idx in zip(_VGG_CAFFE_NAMES, _TV_FEATURE_IDX):
        w = np.asarray(state_dict[f"features.{idx}.weight"], np.float32)  # (O,I,kh,kw)
        b = np.asarray(state_dict[f"features.{idx}.bias"], np.float32)
        if name == "conv1_1":
            # scale for /255 and std, then reorder input channels RGB→BGR
            w = w / (255.0 * _TV_STD[None, :, None, None])
            # bias correction: the network will see x_bgr - pixel_means instead
            # of (x_rgb/255 - mean)/std; constant offset absorbed into bias:
            # offset_c = sum_{i,kh,kw} w[c,i,kh,kw] * (pm_rgb_i/255 - m_i)/s_i*255*s_i…
            pm_rgb = pixel_means_bgr[::-1]
            delta = (pm_rgb / 255.0 - _TV_MEAN) / _TV_STD  # per input channel
            # after the /255·std scale above, w already maps raw-pixel units;
            # remaining constant: w_orig · delta summed over i, kh, kw
            w_orig = np.asarray(state_dict[f"features.{idx}.weight"], np.float32)
            b = b + np.einsum("oikl,i->o", w_orig, delta)
            w = w[:, ::-1]  # RGB→BGR input order
        dst = params["params"]["trunk"][name]
        wf = caffe_conv_to_flax(w)
        assert dst["kernel"].shape == wf.shape, (name, dst["kernel"].shape, wf.shape)
        dst["kernel"], dst["bias"] = wf, b
    return params


_BN_EPS = 1e-5  # torch BatchNorm2d default; torchvision resnets keep it


def fold_bn(gamma, beta, mean, var, eps=_BN_EPS):
    """Fold BatchNorm statistics into the FrozenBN affine (scale, bias).

    y = γ·(x − μ)/√(σ²+ε) + β  ≡  x·scale + bias with
    scale = γ/√(σ²+ε), bias = β − μ·scale.
    """
    scale = np.asarray(gamma, np.float32) / np.sqrt(
        np.asarray(var, np.float32) + eps)
    bias = np.asarray(beta, np.float32) - np.asarray(mean, np.float32) * scale
    return scale, bias


def _tv_conv(state_dict, key):
    """torchvision conv weight (O, I, kH, kW) → flax (kH, kW, I, O)."""
    return caffe_conv_to_flax(np.asarray(state_dict[f"{key}.weight"], np.float32))


def _tv_bn(state_dict, key):
    scale, bias = fold_bn(
        state_dict[f"{key}.weight"], state_dict[f"{key}.bias"],
        state_dict[f"{key}.running_mean"], state_dict[f"{key}.running_var"])
    return {"scale": scale, "bias": bias}


def _set(dst, name, **leaves):
    assert name in dst, (name, sorted(dst))
    for k, v in leaves.items():
        assert dst[name][k].shape == v.shape, (name, k, dst[name][k].shape, v.shape)
        dst[name][k] = v


def _load_bottleneck(dst_block: dict, state_dict, prefix: str):
    """torchvision ``layerL.i`` → our Bottleneck (conv1-3/bn1-3 [+proj])."""
    for j in (1, 2, 3):
        _set(dst_block, f"conv{j}", kernel=_tv_conv(state_dict, f"{prefix}.conv{j}"))
        _set(dst_block, f"bn{j}", **_tv_bn(state_dict, f"{prefix}.bn{j}"))
    if f"{prefix}.downsample.0.weight" in state_dict:
        _set(dst_block, "proj", kernel=_tv_conv(state_dict, f"{prefix}.downsample.0"))
        _set(dst_block, "bn_proj", **_tv_bn(state_dict, f"{prefix}.downsample.1"))


def load_resnet_torchvision(params: dict, state_dict=None,
                            weights_path: str | None = None,
                            depth: int = 101, adapt_input: bool = True) -> dict:
    """Merge a torchvision ResNet state-dict into params (trunk [+conv5 head]).

    BN statistics fold into FrozenBN (:func:`fold_bn`).  The stem conv gets
    the same RGB/255-normalized → BGR mean-subtracted input adaptation as
    :func:`load_vgg16_torchvision`.  ``layer1``-``layer3`` → trunk
    ``stage2``-``stage4``; ``layer4`` → the per-RoI conv5 head
    (``classify_head/stage5_block*``) when the arch uses ``NET.ROI_CONV5``
    (skipped otherwise — the fc-head arch has no conv5 parameters).

    GEOMETRY: torchvision's shipped resnet50/101/152 are **v1.5** (stride on
    the 3x3) — the destination model must be built with
    ``NET.RESNET_STRIDE_IN_3X3`` or every shape matches but the features
    diverge from the pretrained regime (train_net auto-enables it; see
    models/resnet.py::Bottleneck).  Stride placement lives in the module,
    not the weights, so this function cannot detect a mismatch itself.
    """
    import copy

    from mnc_tpu.models.resnet import _DEPTHS

    if state_dict is None:
        import torch

        assert weights_path, "state_dict or weights_path required"
        state_dict = torch.load(weights_path, map_location="cpu")
    state_dict = {k: np.asarray(v, np.float32) if hasattr(v, "__array__")
                  else v for k, v in state_dict.items()}
    params = copy.deepcopy(params)

    from mnc_tpu.config import cfg

    trunk = params["params"]["trunk"]
    # stem: input-convention adaptation (see load_vgg16_torchvision); the
    # stem conv is bias-free, so the constant offset folds into bn1's bias.
    # adapt_input=False copies conv1 verbatim (state dicts already in the
    # BGR mean-subtracted convention, and exactness tests).
    w_orig = np.asarray(state_dict["conv1.weight"], np.float32)  # (64,3,7,7)
    bn1 = _tv_bn(state_dict, "bn1")
    if adapt_input:
        w = w_orig / (255.0 * _TV_STD[None, :, None, None])
        w = w[:, ::-1]  # RGB→BGR input order
        pm_rgb = np.asarray(cfg.PIXEL_MEANS, np.float32).reshape(3)[::-1]
        delta = (pm_rgb / 255.0 - _TV_MEAN) / _TV_STD
        offset = np.einsum("oikl,i->o", w_orig, delta)  # pre-BN constant shift
        bn1["bias"] = bn1["bias"] + bn1["scale"] * offset
    else:
        w = w_orig
    _set(trunk, "conv1", kernel=caffe_conv_to_flax(w))
    _set(trunk, "bn1", **bn1)

    blocks = _DEPTHS[depth]
    for stage, n_blocks in enumerate(blocks[:3]):  # layer1-3 → stage2-4
        for i in range(n_blocks):
            _load_bottleneck(trunk[f"stage{stage + 2}_block{i}"],
                             state_dict, f"layer{stage + 1}.{i}")
    head = params["params"].get("classify_head")
    if head is not None and "stage5_block0" in head:  # NET.ROI_CONV5 arch
        for i in range(blocks[3]):
            _load_bottleneck(head[f"stage5_block{i}"], state_dict, f"layer4.{i}")
    return params
