"""Parity-day full-dress rehearsal (VERDICT r4 item 4).

The real released weights (``mnc_model.caffemodel.h5``) are unreachable in a
zero-egress sandbox, so these tests run the ENTIRE import seam against a
fabricated full-size double: the recalled reference layer-name set
(``models/VGG16/mnc_5stage/test.prototxt†``) with true VGG-16 blob shapes,
through wire/HDF5 parse → shape-derived arch auto-config (MASK_SIZE 28) →
param re-init → weight conversion — plus the failure modes (unmatched
layer list raises loudly; ``--remap`` recovers misnamed layers).
"""

import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, "tools"))

from fabricate_caffemodel import fabricate_blobs, mnc_blob_shapes  # noqa: E402

from mnc_tpu.models.mnc import MNC, MNCArch  # noqa: E402
from mnc_tpu.utils.caffemodel import (  # noqa: E402
    infer_arch_overrides,
    load_mnc_caffemodel,
    read_caffemodel,
    write_caffemodel,
    write_caffemodel_h5,
)
from mnc_tpu.utils.checkpoint import load_import_weights  # noqa: E402


@pytest.fixture(scope="module")
def full_blobs():
    """Full-size fabricated reference weights (MASK_SIZE 28, 21 classes)."""
    return fabricate_blobs(mask_size=28, num_classes=21, seed=3)


def _small_arch(**kw):
    """Tiny canvas / working set, but the TRUE head dims of the released
    model (fc6 25088→4096, warp 14, 21 classes) so full-size blobs fit."""
    base = dict(canvas=(96, 128), anchor_scales=(2, 4, 8), num_classes=21,
                mask_size=21, warp_hw=14, fc_dim=4096, mask_fc_dim=256,
                n_stages=5, compute_dtype=jnp.float32, pre_nms_top_n=64,
                post_nms_top_n=16, rpn_min_size=4.0)
    base.update(kw)
    return MNCArch(**base)


def _init(arch):
    model = MNC(arch=arch)
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros((*arch.canvas, 3), jnp.float32),
                      jnp.array([*arch.canvas, 1.0], jnp.float32))


def test_writer_reader_roundtrip_all_formats(tmp_path):
    rs = np.random.RandomState(0)
    blobs = {"conv_x": [rs.randn(8, 3, 3, 3).astype(np.float32),
                        rs.randn(8).astype(np.float32)],
             "fc/y": [rs.randn(4, 72).astype(np.float32)]}
    for tag, write in (("v1", lambda p, b: write_caffemodel(p, b, v1=True)),
                       ("new", lambda p, b: write_caffemodel(p, b, v1=False)),
                       ("h5", write_caffemodel_h5)):
        path = str(tmp_path / f"m_{tag}.caffemodel")
        write(path, blobs)
        back = read_caffemodel(path)
        assert list(back) == list(blobs), tag
        for k in blobs:
            assert len(back[k]) == len(blobs[k])
            for a, b in zip(blobs[k], back[k]):
                np.testing.assert_array_equal(a, b, err_msg=f"{tag}/{k}")


def test_h5_magic_dispatch(tmp_path, full_blobs):
    """The released model is .caffemodel.h5 — same dict from either format."""
    small = {k: full_blobs[k] for k in ("conv1_1", "rpn_cls_score",
                                        "mask_pred", "cls_score")}
    p1 = str(tmp_path / "m.caffemodel")
    p2 = str(tmp_path / "m.caffemodel.h5")
    write_caffemodel(p1, small)
    write_caffemodel_h5(p2, small)
    b1, b2 = read_caffemodel(p1), read_caffemodel(p2)
    assert set(b1) == set(b2) == set(small)
    for k in small:
        for a, b in zip(b1[k], b2[k]):
            np.testing.assert_array_equal(a, b)


def test_infer_arch_overrides(full_blobs):
    ov = infer_arch_overrides(full_blobs)
    assert ov == {"mask_size": 28, "num_classes": 21, "fc_dim": 4096,
                  "mask_fc_dim": 256, "warp_hw": 14}


def test_blob_shapes_cover_the_recalled_layer_set():
    shapes = mnc_blob_shapes()
    # every destination in the importer's canonical map has a source layer
    from mnc_tpu.utils.caffemodel import _MNC_LAYER_MAP

    dests = {v[0] for v in _MNC_LAYER_MAP.values()}
    covered = {(_MNC_LAYER_MAP[n][0]) for n in shapes if n in _MNC_LAYER_MAP}
    assert covered == dests, (dests - covered)


def test_fullsize_import_autoconfigures_mask28(tmp_path, full_blobs):
    """import → auto-config (21→28) → re-init → load: the day-one path."""
    path = str(tmp_path / "mnc_model.caffemodel")
    write_caffemodel(path, full_blobs)

    arch = _small_arch()  # mask_size defaults to 21 ≠ the file's 28
    params = _init(arch)
    reinits = []

    def make_params(a):
        reinits.append(a)
        return _init(a)

    new_params, new_arch = load_import_weights(
        path, None, arch, params, make_params=make_params)
    assert new_arch.mask_size == 28
    assert not new_arch.bbox_pred_normalized
    assert not new_arch.suppress_untrainable_anchors
    assert len(reinits) == 1 and reinits[0].mask_size == 28
    # conversion exactness: conv OIHW→HWIO, fc CHW→HWC permute, fc_flat .T
    t = new_params["params"]["trunk"]["conv1_1"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(t), np.transpose(full_blobs["conv1_1"][0], (2, 3, 1, 0)))
    cls_k = new_params["params"]["classify_head"]["cls_score"]["kernel"]
    np.testing.assert_array_equal(np.asarray(cls_k),
                                  full_blobs["cls_score"][0].T)
    mp = new_params["params"]["mask_head"]["mask_pred"]["kernel"]
    assert mp.shape == (256, 28 * 28)
    np.testing.assert_array_equal(np.asarray(mp), full_blobs["mask_pred"][0].T)
    # fc6 CHW→HWC: row (c, y, x) of the caffe blob lands at (y, x, c)
    fc6 = np.asarray(
        new_params["params"]["classify_head"]["fc6"]["kernel"])
    src = full_blobs["fc6"][0].reshape(4096, 512, 7, 7)
    np.testing.assert_array_equal(
        fc6.reshape(7, 7, 512, 4096)[2, 3, 17], src[:, 17, 2, 3])


def test_misnamed_mask_branch_fails_loud_then_remap_recovers(
        tmp_path, full_blobs):
    """The ⚠-recalled mask-branch names are THE day-one seam: if the real
    prototxt spells them differently, the import must fail loudly (not
    silently produce a half-loaded model), and --remap must recover."""
    blobs = dict(full_blobs)
    blobs["mask_est_fc"] = blobs.pop("fc6_maskest")
    blobs["mask_score"] = blobs.pop("mask_pred")
    path = str(tmp_path / "misnamed.caffemodel")
    write_caffemodel(path, blobs)

    arch = _small_arch()
    params = _init(arch)

    # Without remap: mask_pred is absent → no auto-config → the 28² blobs
    # fit nothing → strict import raises naming the unmatched layers.
    with pytest.raises(ValueError) as ei:
        load_mnc_caffemodel(path, params, strict=True)
    assert "mask_score" in str(ei.value)

    # --remap recovers: exact-name match AND auto-config both see 28.
    new_params, new_arch = load_import_weights(
        path, None, arch, params,
        remap=["mask_est_fc=fc6_maskest", "mask_score=mask_pred"],
        make_params=_init)
    assert new_arch.mask_size == 28
    np.testing.assert_array_equal(
        np.asarray(new_params["params"]["mask_head"]["mask_pred"]["kernel"]),
        full_blobs["mask_pred"][0].T)


def test_shape_fallback_recovers_unique_misnamed_conv(tmp_path, full_blobs):
    blobs = dict(full_blobs)
    blobs["conv3_1/renamed"] = blobs.pop("conv3_1")
    path = str(tmp_path / "c.caffemodel")
    write_caffemodel(path, blobs)
    arch = _small_arch(mask_size=28)
    params = load_mnc_caffemodel(path, _init(arch))
    np.testing.assert_array_equal(
        np.asarray(params["params"]["trunk"]["conv3_1"]["kernel"]),
        np.transpose(full_blobs["conv3_1"][0], (2, 3, 1, 0)))


def test_autoconfig_without_reinit_hook_raises(tmp_path, full_blobs):
    path = str(tmp_path / "m.caffemodel")
    write_caffemodel(path, full_blobs)
    arch = _small_arch()  # mask 21 vs the file's 28 → needs re-init
    with pytest.raises(ValueError, match="make_params"):
        load_import_weights(path, None, arch, _init(arch))
