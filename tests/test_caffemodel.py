"""Caffemodel (protobuf wire format) reader + MNC weight import.

Fixtures hand-encode real NetParameter wire bytes (both the V1 `layers=2`
MNC-era layout and the 1.0 `layer=100` layout, packed and legacy-dims blob
variants) so the reader is tested against the format itself, not a mock.
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np

from mnc_tpu.models.mnc import MNC, MNCArch
from mnc_tpu.utils.caffemodel import (
    load_mnc_caffemodel,
    read_caffemodel,
)

# ---------------------------------------------------------------------------
# minimal protobuf wire encoder (test-side)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _blob(arr: np.ndarray, legacy_dims: bool = False) -> bytes:
    data = _len_field(5, np.asarray(arr, "<f4").ravel().tobytes())  # packed
    if legacy_dims:
        dims = list(arr.shape)
        dims = [1] * (4 - len(dims)) + dims
        shape_bytes = b"".join(_tag(i + 1, 0) + _varint(d)
                               for i, d in enumerate(dims))
        return shape_bytes + data
    shape = _len_field(1, b"".join(_varint(d) for d in arr.shape))
    return data + _len_field(7, shape)


def _layer_v1(name: str, blobs) -> bytes:
    payload = _len_field(4, name.encode())
    for b in blobs:
        payload += _len_field(6, b)
    return _len_field(2, payload)


def _layer_new(name: str, blobs) -> bytes:
    payload = _len_field(1, name.encode())
    for b in blobs:
        payload += _len_field(7, b)
    return _len_field(100, payload)


# ---------------------------------------------------------------------------


def test_read_both_formats_and_legacy_dims(tmp_path):
    rs = np.random.RandomState(0)
    w1 = rs.randn(4, 3, 3, 3).astype(np.float32)
    b1 = rs.randn(4).astype(np.float32)
    w2 = rs.randn(6, 10).astype(np.float32)

    buf = (_layer_v1("conv_a", [_blob(w1), _blob(b1)])
           + _layer_new("fc_b", [_blob(w2, legacy_dims=True)])
           + _layer_v1("no_weights", []))
    path = tmp_path / "m.caffemodel"
    path.write_bytes(buf)

    out = read_caffemodel(str(path))
    assert set(out) == {"conv_a", "fc_b"}
    np.testing.assert_array_equal(out["conv_a"][0], w1)
    np.testing.assert_array_equal(out["conv_a"][1], b1)
    # legacy (1, 1, 6, 10) squeezes to (6, 10)
    np.testing.assert_array_equal(out["fc_b"][0], w2)


ARCH = MNCArch(canvas=(64, 96), anchor_scales=(1, 2, 4), num_classes=4,
               mask_size=9, warp_hw=4, n_stages=3, compute_dtype=jnp.float32,
               fc_dim=32, mask_fc_dim=16, pre_nms_top_n=32, post_nms_top_n=8,
               rpn_min_size=4.0)


def _params():
    model = MNC(arch=ARCH)
    img = jnp.zeros((*ARCH.canvas, 3), jnp.float32)
    return model, model.init(jax.random.PRNGKey(0), img,
                             jnp.array([64.0, 96.0, 1.0]))


def test_mnc_import_conv_and_fc_permutation(tmp_path):
    model, params = _params()
    rs = np.random.RandomState(1)

    # conv1_1: caffe (O=64, I=3, 3, 3)
    wc = rs.randn(64, 3, 3, 3).astype(np.float32)
    bc = rs.randn(64).astype(np.float32)
    # fc6 input: pooled (2, 2, 512) at warp 4/pool 2 — caffe flattens CHW
    c, hw = 512, ARCH.pooled_hw
    o = ARCH.fc_dim
    wf = rs.randn(o, c * hw * hw).astype(np.float32)
    bf = rs.randn(o).astype(np.float32)

    buf = (_layer_v1("conv1_1", [_blob(wc), _blob(bc)])
           + _layer_v1("fc6", [_blob(wf), _blob(bf)])
           + _layer_v1("some_lr_layer", [_blob(rs.randn(3).astype(np.float32))]))
    path = tmp_path / "mnc.caffemodel"
    path.write_bytes(buf)

    out = load_mnc_caffemodel(str(path), params)
    got = out["params"]["trunk"]["conv1_1"]
    np.testing.assert_array_equal(got["kernel"],
                                  np.transpose(wc, (2, 3, 1, 0)))
    np.testing.assert_array_equal(got["bias"], bc)

    # fc6 equivalence: caffe y = W @ flat_CHW(x) must equal ours
    # y = flat_HWC(x) @ K for any x
    x = rs.randn(hw, hw, c).astype(np.float32)
    y_caffe = wf @ x.transpose(2, 0, 1).reshape(-1) + bf
    k = np.asarray(out["params"]["classify_head"]["fc6"]["kernel"])
    y_ours = x.reshape(-1) @ k + np.asarray(
        out["params"]["classify_head"]["fc6"]["bias"])
    np.testing.assert_allclose(y_ours, y_caffe, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Full-graph round-trip: write the COMPLETE recalled 5-stage layer inventory
# from a param tree into caffemodel wire bytes, import it back, and forward
# (VERDICT r2 next-round item 2).
# ---------------------------------------------------------------------------

# canonical caffemodel layer name per destination (one alias each)
_EXPORT_NAMES = {
    ("trunk", n): n for n in (
        "conv1_1", "conv1_2", "conv2_1", "conv2_2",
        "conv3_1", "conv3_2", "conv3_3",
        "conv4_1", "conv4_2", "conv4_3",
        "conv5_1", "conv5_2", "conv5_3")
}
_EXPORT_NAMES.update({
    ("rpn_head", "rpn_conv"): "rpn_conv/3x3",
    ("rpn_head", "rpn_cls_score"): "rpn_cls_score",
    ("rpn_head", "rpn_bbox_pred"): "rpn_bbox_pred",
    ("classify_head", "fc6"): "fc6",
    ("classify_head", "fc7"): "fc7",
    ("classify_head", "cls_score"): "cls_score",
    ("classify_head", "bbox_pred"): "bbox_pred",
    ("mask_head", "fc_mask"): "fc6_maskest",
    ("mask_head", "mask_pred"): "mask_pred",
})
_SPATIAL_FC = {"fc6", "fc6_maskest"}  # caffe flattens their input CHW


def _export_caffemodel(params, rename=None, fmt=_layer_v1) -> bytes:
    """params tree → NetParameter wire bytes (inverse of the importer)."""
    buf = b""
    for path_keys, lname in _EXPORT_NAMES.items():
        tree = params["params"]
        for p in path_keys:
            tree = tree[p]
        k = np.asarray(tree["kernel"], np.float32)
        b = np.asarray(tree["bias"], np.float32)
        if k.ndim == 4:  # conv (kH,kW,I,O) → caffe (O,I,kH,kW)
            w = np.transpose(k, (3, 2, 0, 1))
        elif lname in _SPATIAL_FC:  # (H*W*C, O) → caffe (O, C*H*W)
            i, o = k.shape
            c = 512
            hw = int(round((i // c) ** 0.5))
            assert hw * hw * c == i, (lname, k.shape)
            w = k.T.reshape(o, hw, hw, c).transpose(0, 3, 1, 2).reshape(o, i)
        else:
            w = k.T
        name = (rename or {}).get(lname, lname)
        buf += fmt(name, [_blob(w), _blob(b)])
    return buf


def test_full_graph_roundtrip_and_forward(tmp_path):
    """Every layer of the recalled 5-stage inventory survives caffemodel
    export → import bit-exactly, and the imported model runs a full forward
    to detections (strict mode: nothing skipped or mismatched)."""
    model, fresh = _params()
    rs = np.random.RandomState(7)
    src = jax.tree.map(  # distinct values everywhere, same structure
        lambda x: rs.randn(*np.shape(x)).astype(np.float32), fresh)
    path = tmp_path / "full.caffemodel"
    path.write_bytes(_export_caffemodel(src))

    out = load_mnc_caffemodel(str(path), fresh, strict=True)
    for kp, leaf in jax.tree_util.tree_leaves_with_path(src):
        node = out
        for k in kp:
            node = node[k.key]
        np.testing.assert_array_equal(np.asarray(node), np.asarray(leaf),
                                      err_msg=str(kp))

    # imported params drive a full forward to detections
    from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg

    pipe = MNCPipeline(model, out, PostCfg(dets_per_class=4, max_per_image=8,
                                           paste=False))
    img = jnp.zeros((*ARCH.canvas, 3), jnp.float32)
    dets = jax.device_get(pipe.detect_canvas(img, jnp.array([64.0, 96.0, 1.0])))
    assert dets["boxes"].shape[-1] == 4


def test_shape_fallback_recovers_misnamed_mask_layers(tmp_path):
    """The mask-branch layer names are recalled (⚠ STATUS): if the real file
    uses different names, the shape-based fallback must still place them —
    their shapes are unique in the graph."""
    model, params = _params()
    rs = np.random.RandomState(11)
    src = jax.tree.map(lambda x: rs.randn(*np.shape(x)).astype(np.float32),
                       params)
    path = tmp_path / "misnamed.caffemodel"
    path.write_bytes(_export_caffemodel(
        src, rename={"fc6_maskest": "fc_mask_est_v2",
                     "mask_pred": "mask_score"}))
    out = load_mnc_caffemodel(str(path), params, strict=True)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["mask_head"]["fc_mask"]["kernel"]),
        np.asarray(src["params"]["mask_head"]["fc_mask"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(out["params"]["mask_head"]["mask_pred"]["kernel"]),
        np.asarray(src["params"]["mask_head"]["mask_pred"]["kernel"]))


def test_remap_resolves_ambiguous_names(tmp_path):
    """conv3_2 and conv3_3 have identical shapes: with BOTH misnamed, each is
    an ambiguous shape match → skipped with a hint; --remap resolves them.
    (A single misnamed layer is unambiguous — the other destinations are
    already name-filled — and shape-matches on its own.)"""
    import pytest

    model, params = _params()
    rs = np.random.RandomState(3)
    src = jax.tree.map(lambda x: rs.randn(*np.shape(x)).astype(np.float32),
                       params)
    rename = {"conv3_2": "conv_b2", "conv3_3": "conv_b3"}
    path = tmp_path / "ambig.caffemodel"
    path.write_bytes(_export_caffemodel(src, rename=rename))

    with pytest.raises(ValueError, match="ambiguous"):
        load_mnc_caffemodel(str(path), params, strict=True)

    out = load_mnc_caffemodel(
        str(path), params, strict=True,
        remap={"conv_b2": "conv3_2", "conv_b3": "conv3_3"})
    for lyr in ("conv3_2", "conv3_3"):
        np.testing.assert_array_equal(
            np.asarray(out["params"]["trunk"][lyr]["kernel"]),
            np.asarray(src["params"]["trunk"][lyr]["kernel"]))

    with pytest.raises(ValueError, match="not in the known layer map"):
        load_mnc_caffemodel(str(path), params,
                            remap={"conv_b2": "not_a_layer"})


def test_parse_remap():
    from mnc_tpu.utils.checkpoint import parse_remap

    assert parse_remap(["a=b", "c=d=e"]) == {"a": "b", "c": "d=e"}
    assert parse_remap(None) == {}
    import pytest

    with pytest.raises(ValueError):
        parse_remap(["nopair"])


def test_mnc_import_strict_raises_on_mismatch(tmp_path):
    import pytest

    model, params = _params()
    bad = np.zeros((7, 7, 7, 7), np.float32)  # wrong conv1_1 shape
    path = tmp_path / "bad.caffemodel"
    path.write_bytes(_layer_v1("conv1_1", [_blob(bad)]))
    with pytest.raises(ValueError, match="incomplete"):
        load_mnc_caffemodel(str(path), params, strict=True)
    # non-strict: reports and leaves params untouched
    out = load_mnc_caffemodel(str(path), params, strict=False)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["trunk"]["conv1_1"]["kernel"]),
        np.asarray(params["params"]["trunk"]["conv1_1"]["kernel"]))
