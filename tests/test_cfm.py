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


# ---------------------------------------------------------------------------
# MCG converter + full CFM test-mode chain (round-1 verdict: plumbing-only)
# ---------------------------------------------------------------------------

def _mcg_mat(path, hw, segments):
    """Write an MCG-format .mat: superpixel label map + candidate label sets."""
    from scipy.io import savemat

    sp = np.ones(hw, np.int32)  # superpixel 1 = background
    for sid, (y1, y2, x1, x2) in enumerate(segments, start=2):
        sp[y1:y2 + 1, x1:x2 + 1] = sid
    labels = np.empty((len(segments), 1), object)
    for k in range(len(segments)):
        labels[k, 0] = np.array([[k + 2]], np.float64)  # candidate k = {sp k+2}
    savemat(path, {"superpixels": sp, "labels": labels})


def test_prepare_mcg_maskdb_cli(tmp_path, monkeypatch):
    import runpy
    import sys

    mcg = tmp_path / "mcg"
    mcg.mkdir()
    segs = [(5, 24, 10, 39), (30, 49, 20, 59)]
    _mcg_mat(str(mcg / "img_a.mat"), (64, 80), segs)
    (tmp_path / "list.txt").write_text("img_a\nmissing_img\n")
    out = tmp_path / "segdb"

    monkeypatch.setattr(sys, "argv", [
        "prepare_mcg_maskdb.py", "--mcg-dir", str(mcg),
        "--image-list", str(tmp_path / "list.txt"), "--out", str(out),
        "--mask-size", "9", "--top-k", "10"])
    sys.path.insert(0, "tools")
    try:
        runpy.run_path("tools/prepare_mcg_maskdb.py", run_name="__main__")
    finally:
        sys.path.pop(0)

    import pickle

    with open(out / "img_a.pkl", "rb") as f:
        rec = pickle.load(f)
    assert rec["boxes"].shape == (2, 4) and rec["masks"].shape == (2, 9, 9)
    np.testing.assert_array_equal(rec["boxes"][0], [10, 5, 39, 24])
    np.testing.assert_allclose(rec["masks"], 1.0, atol=1e-5)  # box-filling segs
    assert not (out / "missing_img.pkl").exists()  # missing .mat skipped


def test_cfm_detect_end_to_end():
    """cfm_detect returns the given segments as pasted detections."""
    from mnc_tpu.models.cfm import cfm_detect
    from mnc_tpu.pipeline.inference import PostCfg

    model = MNC(arch=ARCH)
    img = jnp.zeros((*ARCH.canvas, 3), jnp.float32)
    info = jnp.array([64.0, 96.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, info)

    boxes = np.array([[10, 10, 40, 40], [50, 20, 90, 60]], np.float32)
    masks = np.ones((2, 9, 9), np.float32)
    pad_b = np.zeros((6, 4), np.float32)
    pad_m = np.zeros((6, 9, 9), np.float32)
    seg_boxes = np.concatenate([boxes, pad_b])
    seg_masks = np.concatenate([masks, pad_m])
    seg_valid = np.array([True, True] + [False] * 6)

    post = PostCfg(dets_per_class=4, max_per_image=6, vote_top_k=8,
                   score_thresh=0.0)
    out = jax.device_get(jax.jit(
        lambda p, b, m, v: cfm_detect(model, p, img, info,
                                      jnp.asarray(b), jnp.asarray(m),
                                      jnp.asarray(v), post,
                                      refine_boxes=False))(
        params, seg_boxes, seg_masks, seg_valid))
    assert out["valid"].any()
    # every valid detection's box is one of the two segments
    vb = out["boxes"][out["valid"]]
    for b in vb:
        assert min(np.abs(b - boxes[0]).max(), np.abs(b - boxes[1]).max()) < 1e-3
    # pasted canvas mask covers (roughly) the segment box area
    k = int(np.argmax(out["valid"]))
    cm = out["canvas_masks"][k]
    assert cm.sum() > 0.5 * 31 * 31
