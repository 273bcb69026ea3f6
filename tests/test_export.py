"""jax.export deployment artifacts + pipeline prewarm.

The reference shipped prototxt+caffemodel as its deployment pair (SURVEY.md
§2.2 proto schema, §3.1 demo flow); here the analogue is a serialized
StableHLO program with the weights baked in (mnc_tpu/pipeline/export.py).
These tests round-trip it: export → bytes → deserialize → call must be
numerically identical to the live pipeline.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnc_tpu.config import cfg
from mnc_tpu.models.mnc import MNC, MNCArch
from mnc_tpu.pipeline.export import (
    deserialize_inference,
    export_inference,
    load_exported,
    save_exported,
)
from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg

ARCH = MNCArch(
    canvas=(96, 128),
    anchor_scales=(2, 4, 8),
    num_classes=4,
    mask_size=9,
    warp_hw=4,
    n_stages=3,
    compute_dtype=jnp.float32,
    fc_dim=64,
    mask_fc_dim=32,
    pre_nms_top_n=64,
    post_nms_top_n=16,
    rpn_min_size=4.0,
)
POST = PostCfg(dets_per_class=4, max_per_image=8, paste=True)


@pytest.fixture(scope="module")
def model_params():
    model = MNC(arch=ARCH)
    img = jnp.zeros((*ARCH.canvas, 3), jnp.float32)
    info = jnp.array([96.0, 128.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, info)
    return model, params


def _random_canvas(rs, batch=None):
    shape = (*ARCH.canvas, 3) if batch is None else (batch, *ARCH.canvas, 3)
    return jnp.asarray(rs.randn(*shape).astype(np.float32) * 40.0)


def test_export_roundtrip_single(model_params):
    model, params = model_params
    blob = export_inference(model, params, post=POST)
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = deserialize_inference(blob)

    rs = np.random.RandomState(1)
    img = _random_canvas(rs)
    info = jnp.array([96.0, 128.0, 1.0])

    pipe = MNCPipeline(model, params, POST)
    want = jax.device_get(pipe.detect_canvas(img, info))
    got = jax.device_get(fn(img, info))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-5,
                                   err_msg=k)


def test_export_roundtrip_batched(model_params, tmp_path):
    model, params = model_params
    blob = export_inference(model, params, post=POST, batch=2)
    path = str(tmp_path / "mnc.jaxexport")
    save_exported(path, blob)
    fn = load_exported(path)

    rs = np.random.RandomState(2)
    imgs = _random_canvas(rs, batch=2)
    infos = jnp.tile(jnp.array([96.0, 128.0, 1.0]), (2, 1))
    out = jax.device_get(fn(imgs, infos))
    assert out["boxes"].shape == (2, POST.max_per_image, 4)
    assert out["canvas_masks"].shape == (2, POST.max_per_image, *ARCH.canvas)

    # batched artifact row 0 == single-image program on image 0
    pipe = MNCPipeline(model, params, POST)
    want = jax.device_get(pipe.detect_canvas(imgs[0], infos[0]))
    for k in want:
        np.testing.assert_allclose(out[k][0], want[k], rtol=1e-4, atol=1e-4,
                                   err_msg=k)


def test_exported_pipeline_matches_live(model_params, monkeypatch, tmp_path):
    """ExportedPipeline (artifact + host prep, no model code) must agree
    with MNCPipeline.detect under the same host flags."""
    monkeypatch.setitem(cfg.TEST, "CANVAS_BUCKETS", [])
    monkeypatch.setitem(cfg.TEST, "AUTO_PORTRAIT", False)
    monkeypatch.setitem(cfg.TEST, "HOST_PASTE", False)
    monkeypatch.setitem(cfg.TEST, "PACKED_TRANSFER", False)
    monkeypatch.setitem(cfg.TEST, "U8_TRANSFER", False)
    from mnc_tpu.pipeline.export import ExportedPipeline

    model, params = model_params
    path = str(tmp_path / "mnc.jaxexport")
    save_exported(path, export_inference(model, params, post=POST))

    rs = np.random.RandomState(3)
    im = rs.randint(0, 255, size=(70, 110, 3), dtype=np.uint8)

    live = MNCPipeline(model, params, POST).detect(im)
    exp = ExportedPipeline(path)
    assert exp.canvas == ARCH.canvas
    got = exp.detect(im)
    assert set(got) == set(live)
    for k in live:
        np.testing.assert_allclose(got[k], live[k], rtol=1e-4, atol=1e-4,
                                   err_msg=k)


def test_exported_meta_carries_binarize_thresh(model_params, tmp_path):
    """The artifact container serializes the host unmold threshold the
    program was exported under; ExportedPipeline honors it (and raw
    magic-less blobs still load with defaults)."""
    from mnc_tpu.pipeline.export import ExportedPipeline, _unpack_meta

    model, params = model_params
    post = dataclasses.replace(POST, paste=False, binarize_thresh=0.65)
    blob = export_inference(model, params, post=post)
    raw, meta = _unpack_meta(blob)
    assert meta == {"binarize_thresh": 0.65, "paste": False}

    path = str(tmp_path / "m.jaxexport")
    save_exported(path, blob)
    exp = ExportedPipeline(path)
    assert exp.binarize_thresh == 0.65
    assert ExportedPipeline(path, binarize_thresh=0.3).binarize_thresh == 0.3

    # legacy raw blob (no container): loads, falls back to the default
    path2 = str(tmp_path / "raw.jaxexport")
    save_exported(path2, raw)
    exp2 = ExportedPipeline(path2)
    assert exp2.meta == {}
    assert exp2.binarize_thresh == PostCfg.binarize_thresh
    # and deserialize_inference accepts both forms
    deserialize_inference(blob)
    deserialize_inference(raw)


def test_prewarm_covers_buckets(model_params, monkeypatch):
    model, params = model_params
    # buckets must be feat_stride multiples and smaller than the primary
    monkeypatch.setitem(cfg.TEST, "CANVAS_BUCKETS", [[64, 96]])
    monkeypatch.setitem(cfg.TEST, "AUTO_PORTRAIT", True)
    monkeypatch.setitem(cfg.TEST, "HOST_PASTE", False)
    monkeypatch.setitem(cfg.TEST, "PACKED_TRANSFER", False)
    monkeypatch.setitem(cfg.TEST, "U8_TRANSFER", False)
    pipe = MNCPipeline(model, params, POST)
    warmed = pipe.prewarm()
    # primary + transpose + bucket + bucket-transpose
    assert set(warmed) == {(96, 128), (128, 96), (64, 96), (96, 64)}
    assert set(warmed) <= set(pipe._variants)
    # a detect() on a small landscape image picks the already-warmed bucket
    im = np.zeros((60, 90, 3), np.uint8)
    before = set(pipe._variants)
    out = pipe.detect(im)
    assert set(pipe._variants) == before  # no new variant compiled
    assert out["boxes"].shape[1] == 4


def test_prewarm_batched_variant(model_params, monkeypatch):
    model, params = model_params
    monkeypatch.setitem(cfg.TEST, "CANVAS_BUCKETS", [])
    monkeypatch.setitem(cfg.TEST, "AUTO_PORTRAIT", False)
    monkeypatch.setitem(cfg.TEST, "HOST_PASTE", True)
    pipe = MNCPipeline(model, params, POST)
    warmed = pipe.prewarm(batch_size=2)
    assert warmed == [(96, 128)]
    assert (96, 128) in pipe._nopaste_batch_variants
