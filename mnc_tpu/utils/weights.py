"""Pretrained-weight converters.

≙ the reference's ImageNet initialization step (``train_net.py`` loading
``VGG16.v2.caffemodel`` via ``net.copy_from``, fetched by
``data/scripts/fetch_imagenet_models.sh``).  Two sources are supported:

- a **caffe-export npz** (conv kernels (out, in, kh, kw), fc (out, in) — the
  layout a caffemodel dumps to), BGR channel order, mean-pixel input — our
  trunk keeps those conventions so conversion is a pure transpose;
- a **torchvision VGG-16 state-dict** (torch is in the image); torchvision
  models are RGB + [0,1]-normalized, so the first conv is channel-swapped and
  rescaled to accept the reference's BGR mean-subtracted inputs.
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
