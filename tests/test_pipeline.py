"""End-to-end pipeline: jitted detect + postprocess + evaluator plumbing.

The "minimum end-to-end slice" of SURVEY.md §7.3 on the synthetic dataset:
train briefly, run the full detect pipeline (network + per-class NMS + mask
voting + paste-back in one jit), feed the evaluator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnc_tpu.data.eval_sds import collect_detections, eval_sds
from mnc_tpu.data.synth_imdb import SyntheticIMDB
from mnc_tpu.models.mnc import MNC, MNCArch
from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg, postprocess_detections

ARCH = MNCArch(
    canvas=(96, 128),
    anchor_scales=(2, 4, 8),
    num_classes=4,
    mask_size=9,
    warp_hw=4,
    n_stages=5,
    compute_dtype=jnp.float32,
    fc_dim=64,
    mask_fc_dim=32,
    pre_nms_top_n=64,
    post_nms_top_n=16,
    rpn_min_size=4.0,
)
POST = PostCfg(dets_per_class=4, max_per_image=8, paste=True)


@pytest.fixture(scope="module")
def pipeline():
    model = MNC(arch=ARCH)
    img = jnp.zeros((*ARCH.canvas, 3), jnp.float32)
    im_info = jnp.array([96.0, 128.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, im_info)
    return MNCPipeline(model, params, POST)


def test_postprocess_shapes_standalone():
    n, c, m = 32, 4, 9
    rs = np.random.RandomState(0)
    rois = np.abs(rs.uniform(0, 60, size=(n, 2))).astype(np.float32)
    rois = np.concatenate([rois, rois + 20], axis=1)
    prob = rs.dirichlet(np.ones(c), size=n).astype(np.float32)
    logits = rs.randn(n, m, m).astype(np.float32)
    out = postprocess_detections(
        jnp.asarray(rois), jnp.ones(n, bool), jnp.asarray(prob),
        jnp.asarray(logits), POST, (96, 128))
    assert out["boxes"].shape == (8, 4)
    assert out["canvas_masks"].shape == (8, 96, 128)
    assert out["classes"].shape == (8,)
    cls = np.asarray(out["classes"])
    assert ((cls >= 1) & (cls < c)).all()


def test_detect_canvas_jit_and_eval_plumbing(pipeline):
    imdb = SyntheticIMDB(canvas_hw=ARCH.canvas, num_classes=ARCH.num_classes,
                         num_images=2)
    dets = []
    for i in imdb.image_index:
        ex = imdb.example(i)
        out = jax.device_get(pipeline.detect_canvas(
            jnp.asarray(ex["image"]), jnp.asarray(ex["im_info"])))
        dets.extend(collect_detections(out, i))
    # untrained model: evaluator must still run end to end
    res = eval_sds(dets, imdb.gt_instances(), imdb.num_classes, 0.5)
    assert 0.0 <= res["map"] <= 1.0


def test_detect_host_api(pipeline):
    """detect() maps back to original resolution (here: odd-size image)."""
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, size=(70, 100, 3), dtype=np.uint8)
    out = pipeline.detect(img)
    assert out["boxes"].shape[1] == 4
    assert out["full_masks"].shape[1:] == (70, 100)
    b = out["boxes"][out["valid"]]
    if len(b):
        assert (b[:, 2] <= 100).all() and (b[:, 3] <= 70).all()


def test_oracle_outputs_give_perfect_map():
    """Feed postprocess ground-truth-perfect network outputs → mAP^r = 1.0.

    Validates the whole detect→paste→evaluate chain independently of model
    quality (the debugging separator between 'pipeline broken' and 'model
    undertrained')."""
    from mnc_tpu.data.eval_sds import collect_detections, eval_sds
    from mnc_tpu.data.synth_imdb import SyntheticIMDB
    from mnc_tpu.ops.masks import crop_resize_from_canvas

    imdb = SyntheticIMDB(canvas_hw=(96, 128), num_classes=4, max_gt=4,
                         num_images=3, seed=5)
    n, c, m = 16, 4, 13
    post = PostCfg(dets_per_class=4, max_per_image=8, vote_top_k=8,
                   use_mask_merge=True, paste=True)
    dets = []
    for i in imdb.image_index:
        ex = imdb.example(i)
        g = int(ex["gt_valid"].sum())
        full = imdb.gen.full_masks(i)  # (g, H, W)
        rois = np.tile(ex["gt_boxes"][:1], (n, 1)).astype(np.float32)
        rois[:g] = ex["gt_boxes"][:g]
        valid = np.zeros(n, bool)
        valid[:g] = True
        prob = np.zeros((n, c), np.float32)
        prob[:, 0] = 1.0
        prob[np.arange(g), 0] = 0.0
        prob[np.arange(g), ex["gt_classes"][:g]] = 1.0
        # mask logits: resample full gt mask into the roi frame, ±8 logits
        roi_masks = np.asarray(crop_resize_from_canvas(
            jnp.asarray(full), jnp.asarray(rois[:g]), m))
        logits = np.full((n, m, m), -8.0, np.float32)
        logits[:g] = np.where(roi_masks > 0.5, 8.0, -8.0)
        out = jax.device_get(postprocess_detections(
            jnp.asarray(rois), jnp.asarray(valid), jnp.asarray(prob),
            jnp.asarray(logits), post, (96, 128)))
        dets.extend(collect_detections(out, i, 0.1))
    res = eval_sds(dets, imdb.gt_instances(), imdb.num_classes, 0.5)
    assert res["map"] > 0.95, res
    res7 = eval_sds(dets, imdb.gt_instances(), imdb.num_classes, 0.7)
    assert res7["map"] > 0.9, res7


def test_detect_canvas_batch_matches_single(pipeline):
    """Batched throughput path ≡ per-image path (same detections)."""
    rs = np.random.RandomState(3)
    imgs = jnp.asarray(rs.randn(2, *ARCH.canvas, 3).astype(np.float32) * 20)
    infos = jnp.asarray(np.tile([96.0, 128.0, 1.0], (2, 1)).astype(np.float32))
    batched = jax.device_get(pipeline.detect_canvas_batch(imgs, infos))
    for b in range(2):
        single = jax.device_get(pipeline.detect_canvas(imgs[b], infos[b]))
        for k in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_allclose(
                np.asarray(batched[k][b]), np.asarray(single[k]),
                rtol=2e-3, atol=2e-3, err_msg=k)


def test_detect_auto_orients_portrait(tiny_pipe_setup=None):
    """Portrait input runs on the transposed canvas: full reference scale,
    detections mapped back to original coordinates."""
    import cv2  # noqa: F401  (loader path parity)

    from mnc_tpu.config import cfg
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg
    from mnc_tpu.utils.blob import im_scale_for

    arch = MNCArch(canvas=(64, 96), anchor_scales=(1, 2, 4), num_classes=4,
                   mask_size=9, warp_hw=4, n_stages=3,
                   compute_dtype=jnp.float32, fc_dim=32, mask_fc_dim=16,
                   pre_nms_top_n=32, post_nms_top_n=8, rpn_min_size=2.0)
    model = MNC(arch=arch)
    img0 = jnp.zeros((*arch.canvas, 3), jnp.float32)
    info0 = jnp.array([64.0, 96.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img0, info0)
    pipe = MNCPipeline(model, params,
                       PostCfg(dets_per_class=4, max_per_image=6, vote_top_k=8))

    portrait = (np.random.RandomState(0).rand(120, 60, 3) * 255).astype(np.uint8)
    saved = cfg.TEST.SCALES, cfg.TEST.MAX_SIZE
    try:
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE = (48,), 96
        out = pipe.detect(portrait)
        # the portrait variant was compiled for the transposed canvas
        assert (96, 64) in pipe._variants
        # the portrait canvas admits the full scale rule (no extra downscale)
        s_port = im_scale_for((120, 60), 48, 96, (96, 64))
        s_land = im_scale_for((120, 60), 48, 96, (64, 96))
        assert s_port > s_land
        # outputs are original-resolution
        if out["valid"].any():
            b = out["boxes"][out["valid"]]
            assert (b[:, 2] <= 60).all() and (b[:, 3] <= 120).all()
        assert out["full_masks"].shape[-2:] == (120, 60)
        # landscape image still uses the primary canvas
        land = (np.random.RandomState(1).rand(60, 120, 3) * 255).astype(np.uint8)
        pipe.detect(land)
        assert len(pipe._variants) == 2
        # auto_orient=False forces the primary canvas
        out2 = pipe.detect(portrait, auto_orient=False)
        assert out2["full_masks"].shape[-2:] == (120, 60)
    finally:
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE = saved


def test_canvas_buckets_pick_smallest_fitting():
    from mnc_tpu.config import cfg
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg

    arch = MNCArch(canvas=(128, 192), anchor_scales=(1, 2, 4), num_classes=4,
                   mask_size=9, warp_hw=4, n_stages=3,
                   compute_dtype=jnp.float32, fc_dim=32, mask_fc_dim=16,
                   pre_nms_top_n=32, post_nms_top_n=8, rpn_min_size=2.0)
    model = MNC(arch=arch)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((*arch.canvas, 3), jnp.float32),
                        jnp.array([128.0, 192.0, 1.0]))
    pipe = MNCPipeline(model, params,
                       PostCfg(dets_per_class=4, max_per_image=6, vote_top_k=8))
    saved = cfg.TEST.SCALES, cfg.TEST.MAX_SIZE, cfg.TEST.CANVAS_BUCKETS
    try:
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE = (64,), 192
        cfg.TEST.CANVAS_BUCKETS = ((64, 96),)
        # small landscape image: scaled 64x85 fits the (64, 96) bucket
        assert pipe._pick_canvas(60, 80, True) == (64, 96)
        # wide image: scaled 64x171 needs the full canvas
        assert pipe._pick_canvas(60, 160, True) == (128, 192)
        # portrait small image: oriented bucket (96, 64)
        assert pipe._pick_canvas(80, 60, True) == (96, 64)
        # end to end through detect(): small image runs on the bucket variant
        im = (np.random.RandomState(0).rand(60, 80, 3) * 255).astype(np.uint8)
        out = pipe.detect(im)
        assert (64, 96) in pipe._variants
        assert out["full_masks"].shape[-2:] == (60, 80)
        # buckets not multiple of stride are rejected
        cfg.TEST.CANVAS_BUCKETS = ((50, 96),)
        with pytest.raises(AssertionError, match="multiples"):
            pipe._pick_canvas(60, 80, True)
    finally:
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE, cfg.TEST.CANVAS_BUCKETS = saved


def test_detect_many_matches_detect():
    """Mixed-size batched host API == per-image detect(), including canvas
    grouping, tail padding-by-repetition, and portrait variants."""
    from mnc_tpu.config import cfg

    arch = MNCArch(canvas=(64, 96), anchor_scales=(1, 2, 4), num_classes=4,
                   mask_size=9, warp_hw=4, n_stages=3,
                   compute_dtype=jnp.float32, fc_dim=32, mask_fc_dim=16,
                   pre_nms_top_n=32, post_nms_top_n=8, rpn_min_size=2.0)
    model = MNC(arch=arch)
    img0 = jnp.zeros((*arch.canvas, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img0,
                        jnp.array([64.0, 96.0, 1.0]))
    pipe = MNCPipeline(model, params,
                       PostCfg(dets_per_class=4, max_per_image=6, vote_top_k=8))

    rs = np.random.RandomState(2)
    imgs = [  # 3 landscape + 2 portrait → 2 canvas groups, odd tails both
        (rs.rand(60, 120, 3) * 255).astype(np.uint8),
        (rs.rand(50, 100, 3) * 255).astype(np.uint8),
        (rs.rand(120, 60, 3) * 255).astype(np.uint8),
        (rs.rand(60, 110, 3) * 255).astype(np.uint8),
        (rs.rand(100, 55, 3) * 255).astype(np.uint8),
    ]
    saved = cfg.TEST.SCALES, cfg.TEST.MAX_SIZE
    try:
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE = (48,), 96
        many = pipe.detect_many(imgs, batch_size=2, auto_orient=True,
                                packed=True)
        for im, got in zip(imgs, many):
            want = pipe.detect(im, auto_orient=True, packed=True)
            assert got["full_masks"].shape == want["full_masks"].shape
            np.testing.assert_array_equal(got["valid"], want["valid"])
            np.testing.assert_allclose(got["boxes"], want["boxes"],
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(got["scores"], want["scores"],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_array_equal(got["full_masks"], want["full_masks"])
        # the bounded in-flight window is pure scheduling: strictest window
        # (fetch immediately after each dispatch) must be result-identical
        serial = pipe.detect_many(imgs, batch_size=2, auto_orient=True,
                                  packed=True, max_in_flight=1)
        for got, want in zip(serial, many):
            for k in want:
                np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    finally:
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE = saved


def test_detect_host_paste_matches_device_paste():
    """TEST.HOST_PASTE: boxes/scores/soft masks bit-identical to the
    device-paste route; full_masks agree up to the resampling route."""
    arch = MNCArch(canvas=(64, 96), anchor_scales=(1, 2, 4), num_classes=4,
                   mask_size=9, warp_hw=4, n_stages=3,
                   compute_dtype=jnp.float32, fc_dim=32, mask_fc_dim=16,
                   pre_nms_top_n=32, post_nms_top_n=8, rpn_min_size=2.0)
    model = MNC(arch=arch)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((*arch.canvas, 3), jnp.float32),
                        jnp.array([64.0, 96.0, 1.0]))
    pipe = MNCPipeline(model, params,
                       PostCfg(dets_per_class=4, max_per_image=6, vote_top_k=8))
    from mnc_tpu.config import cfg

    img = (np.random.RandomState(3).rand(60, 90, 3) * 255).astype(np.uint8)
    saved = cfg.TEST.SCALES, cfg.TEST.MAX_SIZE
    try:
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE = (48,), 96
        dev = pipe.detect(img, auto_orient=False, host_paste=False)
        host = pipe.detect(img, auto_orient=False, host_paste=True)
    finally:
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE = saved

    np.testing.assert_array_equal(host["valid"], dev["valid"])
    np.testing.assert_allclose(host["boxes"], dev["boxes"], rtol=1e-5)
    np.testing.assert_allclose(host["scores"], dev["scores"], rtol=1e-5)
    np.testing.assert_allclose(host["masks"], dev["masks"], rtol=1e-5)
    assert host["full_masks"].shape == dev["full_masks"].shape == \
        (len(host["scores"]), 60, 90)
    assert not host["full_masks"][~host["valid"]].any()
    agree = 0
    for k in range(len(host["scores"])):
        if not host["valid"][k]:
            continue
        a, b = host["full_masks"][k] > 0, dev["full_masks"][k] > 0
        if a.sum() > 20 and b.sum() > 20:
            iou = (a & b).sum() / max((a | b).sum(), 1)
            assert iou > 0.5, (k, iou)
            agree += 1
    assert agree > 0  # the comparison wasn't vacuous


def test_detect_many_host_paste():
    """detect_many(host_paste=True) per-image results == detect(host_paste)."""
    arch = MNCArch(canvas=(64, 96), anchor_scales=(1, 2, 4), num_classes=4,
                   mask_size=9, warp_hw=4, n_stages=3,
                   compute_dtype=jnp.float32, fc_dim=32, mask_fc_dim=16,
                   pre_nms_top_n=32, post_nms_top_n=8, rpn_min_size=2.0)
    model = MNC(arch=arch)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((*arch.canvas, 3), jnp.float32),
                        jnp.array([64.0, 96.0, 1.0]))
    pipe = MNCPipeline(model, params,
                       PostCfg(dets_per_class=4, max_per_image=6, vote_top_k=8))
    from mnc_tpu.config import cfg

    rs = np.random.RandomState(4)
    imgs = [(rs.rand(60, 90, 3) * 255).astype(np.uint8) for _ in range(3)]
    saved = cfg.TEST.SCALES, cfg.TEST.MAX_SIZE
    try:
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE = (48,), 96
        many = pipe.detect_many(imgs, batch_size=2, auto_orient=False,
                                host_paste=True)
        for im, got in zip(imgs, many):
            want = pipe.detect(im, auto_orient=False, host_paste=True)
            np.testing.assert_array_equal(got["valid"], want["valid"])
            np.testing.assert_allclose(got["boxes"], want["boxes"],
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_array_equal(got["full_masks"], want["full_masks"])
    finally:
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE = saved


def test_u8_transfer_matches_float_path(pipeline):
    """TEST.U8_TRANSFER (uint8 canvases + on-device mean subtraction) gives
    the same detections as the reference-exact float path up to the <=0.5-LSB
    uint8 rounding after resize (blob.py prep_im_for_blob u8 mode).

    With RANDOM-INIT weights the per-pixel rounding is chaos-amplified
    through 13 unnormalized conv layers: a borderline RPN proposal can flip
    and swap one RoI, moving that row's regressed box tens of px while
    survivors/classes/scores still agree (verified: voting on/off produces
    the identical divergence — it is proposal-flip, not voting).  So boxes
    get a majority-stability assertion here; the end-to-end BIT-exactness of
    the u8 machinery itself is pinned by
    test_u8_transfer_bit_exact_at_integer_means below."""
    from mnc_tpu.config import cfg

    rs = np.random.RandomState(3)
    img = rs.randint(0, 255, size=(70, 100, 3), dtype=np.uint8)
    old = cfg.TEST.U8_TRANSFER
    try:
        cfg.TEST.U8_TRANSFER = False
        out_f = pipeline.detect(img)
        cfg.TEST.U8_TRANSFER = True
        out_u = pipeline.detect(img)
    finally:
        cfg.TEST.U8_TRANSFER = old
    # same survivors; scores agree to resize-rounding tolerance
    np.testing.assert_array_equal(out_f["valid"], out_u["valid"])
    v = out_f["valid"]
    np.testing.assert_array_equal(out_f["classes"][v], out_u["classes"][v])
    np.testing.assert_allclose(out_f["scores"][v], out_u["scores"][v],
                               rtol=0.05, atol=5e-3)
    diffs = np.abs(out_f["boxes"][v] - out_u["boxes"][v])
    assert np.median(diffs) < 1.0, np.median(diffs)
    assert (diffs < 2.0).mean() >= 0.7, (diffs < 2.0).mean()


def test_u8_transfer_bit_exact_at_integer_means():
    """With integer PIXEL_MEANS and scale 1 (no resize), the u8 path is
    BIT-IDENTICAL to the float path end-to-end: host float subtraction and
    device (cast + subtract) produce the same float32 canvas, padding
    included, so every output (boxes, scores, masks, voting) matches exactly
    — voting chaos and all."""
    from mnc_tpu.config import cfg

    model = MNC(arch=ARCH)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((*ARCH.canvas, 3), jnp.float32),
                        jnp.array([96.0, 128.0, 1.0]))
    pipe = MNCPipeline(model, params, POST)
    rs = np.random.RandomState(5)
    img = rs.randint(0, 255, size=(70, 100, 3), dtype=np.uint8)
    saved = cfg.TEST.U8_TRANSFER, cfg.PIXEL_MEANS, cfg.TEST.SCALES, cfg.TEST.MAX_SIZE
    try:
        cfg.PIXEL_MEANS = np.array([[[103.0, 116.0, 123.0]]])
        cfg.TEST.SCALES, cfg.TEST.MAX_SIZE = (70,), 128  # scale == 1.0
        cfg.TEST.U8_TRANSFER = False
        out_f = pipe.detect(img)
        cfg.TEST.U8_TRANSFER = True
        out_u = pipe.detect(img)
    finally:
        (cfg.TEST.U8_TRANSFER, cfg.PIXEL_MEANS,
         cfg.TEST.SCALES, cfg.TEST.MAX_SIZE) = saved
    for k in out_f:
        np.testing.assert_array_equal(np.asarray(out_f[k]), np.asarray(out_u[k]),
                                      err_msg=k)


def test_prep_u8_no_resize_roundtrips_exactly():
    """At scale 1 (no resize) the u8 path is BIT-exact vs the float path:
    canvas_u8 - means == canvas_f32, including the mean-filled padding."""
    from mnc_tpu.config import cfg
    from mnc_tpu.utils.blob import prep_im_for_blob

    rs = np.random.RandomState(4)
    img = rs.randint(0, 255, size=(48, 64, 3), dtype=np.uint8)
    cf, info_f = prep_im_for_blob(img, target_size=48, max_size=64,
                                  canvas_hw=(64, 80))
    cu, info_u = prep_im_for_blob(img, target_size=48, max_size=64,
                                  canvas_hw=(64, 80), u8=True)
    assert cu.dtype == np.uint8
    np.testing.assert_array_equal(info_f, info_u)
    means = np.asarray(cfg.PIXEL_MEANS, np.float32).reshape(1, 1, 3)
    # image region: exact
    np.testing.assert_allclose((cu.astype(np.float32) - means)[:48, :64],
                               cf[:48, :64], atol=1e-5)
    # padding: zero after mean subtraction, to rounding
    np.testing.assert_allclose((cu.astype(np.float32) - means)[48:, 64:],
                               cf[48:, 64:], atol=0.5)


def test_vote_boxes_postprocess_wiring():
    """TEST.VOTE_BOXES: the kept box becomes the score-weighted average of
    its IoU>=0.5 same-class candidates (the mv.pyx box-averaging half,
    VERDICT r3 item 4) — hand-computable 3-roi scenario.  Default off =
    boxes identical to mask-only voting."""
    import dataclasses

    a = np.array([10.0, 10.0, 49.0, 49.0], np.float32)
    b = np.array([12.0, 12.0, 51.0, 51.0], np.float32)  # IoU(a,b) ~ 0.82
    c = np.array([70.0, 70.0, 90.0, 90.0], np.float32)  # isolated
    rois = jnp.asarray(np.stack([a, b, c]))
    # class 1 dominant everywhere; a(0.8) suppresses b(0.6) at NMS 0.3
    prob = jnp.asarray(np.array([[0.2, 0.8, 0.0],
                                 [0.4, 0.6, 0.0],
                                 [0.3, 0.7, 0.0]], np.float32))
    logits = jnp.asarray(np.random.RandomState(0).randn(3, 9, 9).astype(np.float32))
    post_off = PostCfg(dets_per_class=4, max_per_image=4, vote_top_k=3,
                       nms_thresh=0.3, paste=False)
    post_on = dataclasses.replace(post_off, vote_boxes=True)

    out0 = jax.device_get(postprocess_detections(
        rois, jnp.ones(3, bool), prob, logits, post_off, None))
    out1 = jax.device_get(postprocess_detections(
        rois, jnp.ones(3, bool), prob, logits, post_on, None))

    assert np.asarray(out0["valid"]).sum() == 2
    # mask-only voting keeps the NMS boxes verbatim
    np.testing.assert_allclose(out0["boxes"][0], a, atol=1e-5)
    np.testing.assert_allclose(out0["boxes"][1], c, atol=1e-5)
    # vote_boxes: a's neighbors are {a: 0.8, b: 0.6}; c votes alone
    expected_a = (0.8 * a + 0.6 * b) / 1.4
    np.testing.assert_allclose(out1["boxes"][0], expected_a, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out1["boxes"][1], c, atol=1e-5)
    # scores/classes unaffected by box voting
    np.testing.assert_allclose(out0["scores"], out1["scores"], atol=1e-6)
    np.testing.assert_array_equal(out0["classes"], out1["classes"])
