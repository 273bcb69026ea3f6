"""COCO loader: RLE/polygon decoding + end-to-end on a tiny fabricated JSON."""

import json
import os.path as osp

import numpy as np
import pytest

from mnc_tpu.data.coco import COCOSeg, decode_coco_rle, polygons_to_mask


def test_decode_uncompressed_rle():
    # column-major: 3x4, first 5 zeros then 7 ones
    m = decode_coco_rle([5, 7], 3, 4)
    flat = m.T.reshape(-1)
    assert (flat[:5] == 0).all() and (flat[5:] == 1).all()


def test_rle_string_roundtrip_against_native():
    """Our compressed-string decoder vs the native RLE encoder's counts."""
    from mnc_tpu import native

    rs = np.random.RandomState(0)
    mask = (rs.uniform(size=(17, 23)) > 0.6).astype(np.uint8)
    rle = native.rle_encode(mask)
    back = decode_coco_rle(list(rle["counts"]), 17, 23)
    np.testing.assert_array_equal(back, mask)


def test_polygons_to_mask_square():
    pytest.importorskip("cv2")
    m = polygons_to_mask([[2, 2, 10, 2, 10, 10, 2, 10]], 16, 16)
    assert m[5, 5] == 1 and m[0, 0] == 0 and m[12, 12] == 0


def _tiny_coco(tmp_path):
    ann = {
        "images": [{"id": 1, "height": 32, "width": 48, "file_name": "a.jpg"}],
        "categories": [{"id": 7, "name": "cat"}, {"id": 9, "name": "dog"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7, "iscrowd": 0,
             "area": 100.0, "bbox": [4, 4, 10, 8],
             "segmentation": [[4, 4, 13, 4, 13, 11, 4, 11]]},
            {"id": 2, "image_id": 1, "category_id": 9, "iscrowd": 0,
             "area": 64.0, "bbox": [20, 10, 8, 8],
             "segmentation": [[20, 10, 27, 10, 27, 17, 20, 17]]},
        ],
    }
    d = tmp_path / "coco" / "annotations"
    d.mkdir(parents=True)
    with open(d / "instances_tiny.json", "w") as f:
        json.dump(ann, f)
    return str(tmp_path / "coco")


def test_coco_imdb(tmp_path):
    pytest.importorskip("cv2")
    root = _tiny_coco(tmp_path)
    imdb = COCOSeg("tiny", root=root, gt_mask_size=8,
                   cache_dir=str(tmp_path / "cache"))
    assert imdb.classes == ("__background__", "cat", "dog")
    db = imdb.roidb()
    assert len(db) == 1
    assert db[0]["boxes"].shape == (2, 4)
    np.testing.assert_array_equal(db[0]["classes"], [1, 2])
    masks = imdb.maskdb()[0]["masks"]
    assert masks.shape == (2, 8, 8)
    assert masks[0].mean() > 0.8  # full box covered by the polygon
    gt = imdb.gt_instances()
    assert len(gt[1]) == 2
    assert gt[1][0]["mask"].shape == (32, 48)


def test_encode_coco_rle_roundtrip():
    from mnc_tpu.data.coco import encode_coco_rle

    rs = np.random.RandomState(7)
    for _ in range(10):
        h, w = rs.randint(3, 60, size=2)
        m = (rs.uniform(size=(h, w)) > rs.uniform(0.3, 0.8)).astype(np.uint8)
        rle = encode_coco_rle(m)
        assert isinstance(rle["counts"], str) and rle["size"] == [h, w]
        np.testing.assert_array_equal(
            decode_coco_rle(rle["counts"], h, w), m)
    # all-zero and all-one edge cases
    for v in (0, 1):
        m = np.full((5, 9), v, np.uint8)
        rle = encode_coco_rle(m)
        np.testing.assert_array_equal(decode_coco_rle(rle["counts"], 5, 9), m)


def test_coco_e2e_emit_load_train_eval(tmp_path):
    """The full COCO-format pipeline at CPU scale (VERDICT r4 item 5):
    synthetic scenes → REAL COCO JSON (polygon + RLE) → COCOSeg →
    TrainLoader → jitted train steps → averaged AP^r oracle on the gt."""
    pytest.importorskip("cv2")
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(__file__)), "tools"))
    from make_coco_synth import emit_coco_synth

    from mnc_tpu.data.eval_sds import eval_sds_averaged
    from mnc_tpu.data.loader import TrainLoader
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.train.loop import TrainState, make_train_step
    from mnc_tpu.train.optim import make_optimizer

    root = str(tmp_path / "coco")
    emit_coco_synth(root, "mini", 4, canvas_hw=(96, 128), num_classes=4,
                    n_range=(1, 3), seed=5)
    imdb = COCOSeg("mini", root=root, cache_dir=str(tmp_path / "cache"))
    assert len(imdb.classes) == 4
    # both segmentation encodings present in the emitted JSON
    with open(osp.join(root, "annotations", "instances_mini.json")) as f:
        anns = json.load(f)["annotations"]
    kinds = {list if isinstance(a["segmentation"], list) else dict
             for a in anns}
    assert kinds == {list, dict}

    arch = MNCArch(canvas=(96, 128), anchor_scales=(1, 2, 4), num_classes=4,
                   mask_size=13, warp_hw=6, n_stages=5,
                   compute_dtype=jnp.float32, fc_dim=64, mask_fc_dim=32,
                   pre_nms_top_n=64, post_nms_top_n=16, rpn_min_size=4.0,
                   trunk_frozen=0)
    train_cfg = dict(RPN_POSITIVE_OVERLAP=0.6, RPN_NEGATIVE_OVERLAP=0.3,
                     RPN_BATCHSIZE=64, RPN_FG_FRACTION=0.5, BATCH_SIZE=32,
                     FG_FRACTION=0.25, FG_THRESH=0.5, BG_THRESH_HI=0.5,
                     BG_THRESH_LO=0.0)
    model = MNC(arch=arch)
    loader = TrainLoader(imdb, max_gt=4, canvas_hw=arch.canvas,
                         gt_mask_size=21, ims_per_batch=2, prefetch=1)
    batch = next(loader)
    # loader scaled boxes into the canvas and produced fixed shapes
    assert batch["image"].shape == (2, 96, 128, 3)
    assert batch["gt_masks"].shape == (2, 4, 21, 21)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["image"][0], jnp.float32),
                        jnp.asarray(batch["im_info"][0]))
    tx = make_optimizer(params)
    step = make_train_step(model, tx, arch, train_cfg)
    state = TrainState.create(params, tx)
    losses = []
    for it in range(2):
        b = jax.tree.map(jnp.asarray, next(loader))
        state, metrics = step(state, b, jax.random.PRNGKey(it))
        losses.append(float(jax.device_get(metrics["total"])))
    assert all(np.isfinite(losses)), losses

    # COCO-style averaged AP^r: the gt against itself must be ~1.0
    gt = imdb.gt_instances()
    dets = []
    for image_id, insts in gt.items():
        for inst in insts:
            dets.append({"image_id": image_id,
                         "class_id": inst["class_id"],
                         "score": 1.0, "mask": inst["mask"]})
    r = eval_sds_averaged(dets, gt, imdb.num_classes)
    assert r["map"] > 0.99, r
