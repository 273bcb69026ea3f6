"""Real-data reader fixtures: SBD .mat / VOC XML paths actually executed.

Round-1 verdict: the PascalVOCSeg/_load_mats/_instances and PascalVOCDet XML
paths had zero coverage — "the guaranteed first breakage on real data".
These tests build byte-faithful miniature datasets on disk (scipy.io.savemat
structs in the benchmark_RELEASE layout; VOC XML annotations) and drive the
full chain: .mat → records → pickle cache → TrainLoader → one jitted train
step, and gt_instances → eval_sds.
"""

import os.path as osp
import pickle
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.io import savemat

from mnc_tpu.config import cfg
from mnc_tpu.data.eval_sds import eval_sds
from mnc_tpu.data.loader import TrainLoader
from mnc_tpu.data.pascal_voc import PascalVOCDet, PascalVOCSeg, get_imdb

# ---------------------------------------------------------------------------
# fixture datasets on disk
# ---------------------------------------------------------------------------

# (image id, (H, W), instances: list of (class_id, y1, y2, x1, x2))
SBD_IMAGES = [
    ("2008_000001", (60, 80), [(1, 10, 29, 10, 39), (15, 35, 54, 40, 69)]),
    ("2008_000002", (48, 64), [(15, 8, 39, 12, 51)]),
]


def _inst_maps(hw, instances):
    inst = np.zeros(hw, np.uint8)
    clsm = np.zeros(hw, np.uint8)
    for iid, (c, y1, y2, x1, x2) in enumerate(instances, start=1):
        inst[y1:y2 + 1, x1:x2 + 1] = iid
        clsm[y1:y2 + 1, x1:x2 + 1] = c
    return inst, clsm


@pytest.fixture(scope="module")
def sbd_root(tmp_path_factory):
    """benchmark_RELEASE-layout SBD miniature with real .mat structs."""
    import cv2

    root = tmp_path_factory.mktemp("sbd")
    ds = root / "benchmark_RELEASE" / "dataset"
    for sub in ("inst", "cls", "img"):
        (ds / sub).mkdir(parents=True)
    ids = []
    for index, hw, instances in SBD_IMAGES:
        inst, clsm = _inst_maps(hw, instances)
        # the real files store MATLAB structs GTinst/GTcls with a
        # Segmentation field (savemat maps dict -> struct identically)
        savemat(str(ds / "inst" / f"{index}.mat"),
                {"GTinst": {"Segmentation": inst,
                            "Categories": np.array([[c] for c, *_ in instances],
                                                   np.float64)}})
        savemat(str(ds / "cls" / f"{index}.mat"),
                {"GTcls": {"Segmentation": clsm,
                           "CategoriesPresent": np.unique(
                               [c for c, *_ in instances]).astype(np.float64)}})
        rs = np.random.RandomState(len(ids))
        img = rs.randint(0, 255, (*hw, 3), np.uint8)
        cv2.imwrite(str(ds / "img" / f"{index}.jpg"), img)
        ids.append(index)
    (root / "train.txt").write_text("\n".join(ids) + "\n")
    return root


def _seg(root, tmp_path, **kw):
    return PascalVOCSeg("train", devkit_path=str(root),
                        cache_dir=str(tmp_path / "cache"), **kw)


# ---------------------------------------------------------------------------
# SBD .mat path
# ---------------------------------------------------------------------------

def test_sbd_mat_struct_indexing(sbd_root, tmp_path):
    imdb = _seg(sbd_root, tmp_path)
    assert imdb.image_index == [i for i, _, _ in SBD_IMAGES]
    inst_map, cls_map = imdb._load_mats("2008_000001")
    assert inst_map.shape == (60, 80) and cls_map.shape == (60, 80)
    assert set(np.unique(inst_map)) == {0, 1, 2}
    assert set(np.unique(cls_map)) == {0, 1, 15}


def test_sbd_instances_classes_and_boxes(sbd_root, tmp_path):
    imdb = _seg(sbd_root, tmp_path)
    inst = imdb._instances("2008_000001")
    assert [c for c, _, _ in inst] == [1, 15]
    # boxes are tight (x1, y1, x2, y2) pixel bounds of each instance
    np.testing.assert_array_equal(inst[0][2], [10, 10, 39, 29])
    np.testing.assert_array_equal(inst[1][2], [40, 35, 69, 54])
    assert inst[0][1].sum() == 20 * 30


def test_sbd_records_masks_and_cache(sbd_root, tmp_path):
    imdb = _seg(sbd_root, tmp_path, gt_mask_size=16)
    recs = imdb.records
    assert len(recs) == 2
    r0 = recs[0]
    assert r0["boxes"].shape == (2, 4) and r0["masks"].shape == (2, 16, 16)
    # full-box rectangles crop to all-ones masks at any resolution (area
    # filter leaves ~1e-7 float residue)
    np.testing.assert_allclose(r0["masks"], 1.0, atol=1e-5)
    np.testing.assert_array_equal(r0["classes"], [1, 15])

    cache = osp.join(str(tmp_path / "cache"), f"{imdb.name}_s16_maskdb.pkl")
    assert osp.exists(cache)
    # cache round-trip: a fresh imdb must serve identical records from pickle
    imdb2 = _seg(sbd_root, tmp_path, gt_mask_size=16)
    np.testing.assert_array_equal(imdb2.records[0]["masks"], r0["masks"])
    with open(cache, "rb") as f:
        assert len(pickle.load(f)) == 2


def test_sbd_gt_instances_oracle_eval(sbd_root, tmp_path):
    """gt_instances feeds eval_sds; oracle detections score mAP^r = 1."""
    imdb = _seg(sbd_root, tmp_path)
    gt = imdb.gt_instances()
    assert set(gt.keys()) == set(imdb.image_index)
    dets = [
        {"image_id": iid, "class_id": g["class_id"], "score": 0.9,
         "mask": g["mask"]}
        for iid, gs in gt.items() for g in gs
    ]
    res = eval_sds(dets, gt, imdb.num_classes, 0.5)
    assert res["map"] == pytest.approx(1.0)


def test_sbd_loader_to_train_step(sbd_root, tmp_path, monkeypatch):
    """The full real-data chain: .mat records → TrainLoader (real jpg decode,
    reference scale rule, flip augmentation) → one jitted 5-stage train step."""
    from mnc_tpu.models.mnc import MNC, MNCArch
    from mnc_tpu.train.loop import TrainState, make_train_step
    from mnc_tpu.train.optim import make_optimizer

    monkeypatch.setattr(cfg.TRAIN, "SCALES", (64,))
    monkeypatch.setattr(cfg.TRAIN, "MAX_SIZE", 96)
    imdb = _seg(sbd_root, tmp_path, gt_mask_size=16)
    loader = TrainLoader(imdb, max_gt=4, canvas_hw=(64, 96), gt_mask_size=16,
                         use_flipped=True, seed=0)
    arch = MNCArch(canvas=(64, 96), anchor_scales=(2, 4, 8), num_classes=21,
                   mask_size=9, warp_hw=4, n_stages=5,
                   compute_dtype=jnp.float32, fc_dim=32, mask_fc_dim=32,
                   pre_nms_top_n=64, post_nms_top_n=16, rpn_min_size=4.0)
    model = MNC(arch=arch)
    batches = [next(loader) for _ in range(4)]  # covers flipped entries w.h.p.
    b0 = batches[0]
    assert b0["image"].shape == (64, 96, 3)
    assert b0["gt_valid"].sum() >= 1
    # gt boxes landed inside the scaled image area
    hh, ww = b0["im_info"][:2]
    gb = b0["gt_boxes"][b0["gt_valid"]]
    assert (gb[:, 2] <= ww - 0.5).all() and (gb[:, 3] <= hh - 0.5).all()

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(b0["image"]),
                        jnp.asarray(b0["im_info"]))
    tx = make_optimizer(params, base_lr=1e-3)
    step = make_train_step(model, tx, arch, dict(
        RPN_POSITIVE_OVERLAP=0.7, RPN_NEGATIVE_OVERLAP=0.3, RPN_BATCHSIZE=64,
        RPN_FG_FRACTION=0.5, BATCH_SIZE=32, FG_FRACTION=0.25, FG_THRESH=0.5,
        BG_THRESH_HI=0.5, BG_THRESH_LO=0.0))
    state = TrainState.create(params, tx)
    for i, b in enumerate(batches[:2]):
        state, metrics = step(state, {k: jnp.asarray(v) for k, v in b.items()},
                              jax.random.PRNGKey(i))
    m = jax.device_get(metrics)
    assert np.isfinite(m["total"])


def test_sbd_missing_split_raises(sbd_root, tmp_path):
    imdb = _seg(sbd_root, tmp_path)
    imdb._image_set = "nonexistent"
    with pytest.raises(FileNotFoundError):
        _ = imdb.image_index


# ---------------------------------------------------------------------------
# VOC detection XML path
# ---------------------------------------------------------------------------

def _voc_xml(objs):
    root = ET.Element("annotation")
    for name, (x1, y1, x2, y2), difficult in objs:
        o = ET.SubElement(root, "object")
        ET.SubElement(o, "name").text = name
        ET.SubElement(o, "difficult").text = str(int(difficult))
        bb = ET.SubElement(o, "bndbox")
        for tag, v in zip(("xmin", "ymin", "xmax", "ymax"), (x1, y1, x2, y2)):
            ET.SubElement(bb, tag).text = str(v)
    return ET.tostring(root, encoding="unicode")


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc") / "VOCdevkit2012"
    base = root / "VOC2012"
    for sub in ("Annotations", "JPEGImages", osp.join("ImageSets", "Main")):
        (base / sub).mkdir(parents=True)
    (base / "Annotations" / "2012_0001.xml").write_text(_voc_xml([
        ("dog", (49, 12, 180, 97), False),
        ("person", (5, 5, 30, 60), True),   # difficult → must be filtered
        ("Car", (10, 20, 40, 50), False),   # case-insensitive class lookup
    ]))
    (base / "Annotations" / "2012_0002.xml").write_text(_voc_xml([
        ("cat", (1, 1, 99, 99), False),
    ]))
    (base / "ImageSets" / "Main" / "train.txt").write_text(
        "2012_0001\n2012_0002\n")
    return root


def test_voc_det_xml_parsing(voc_root):
    imdb = PascalVOCDet("train", devkit_path=str(voc_root))
    assert imdb.image_index == ["2012_0001", "2012_0002"]
    db = imdb.roidb()
    assert len(db) == 2
    e = db[0]
    # difficult object dropped; 1-based VOC pixels shifted to 0-based
    assert e["boxes"].shape == (2, 4)
    np.testing.assert_array_equal(e["boxes"][0], [48, 11, 179, 96])
    assert e["classes"].tolist() == [imdb.classes.index("dog"),
                                     imdb.classes.index("car")]
    assert imdb.image_path_at(0).endswith("JPEGImages/2012_0001.jpg")


def test_voc_factory_paths(voc_root, sbd_root, monkeypatch):
    monkeypatch.setattr(cfg, "DATA_DIR", str(voc_root.parent))
    det = get_imdb("voc_2012_train")
    assert isinstance(det, PascalVOCDet)
    assert len(det.roidb()) == 2
    monkeypatch.setattr(cfg, "DATA_DIR", str(sbd_root.parent))
    seg = get_imdb("voc_2012_seg_train")
    assert isinstance(seg, PascalVOCSeg)
    # redirect its root at the fixture (factory default is DATA_DIR/sbd)
    seg._root = str(sbd_root)
    seg._dataset = str(sbd_root / "benchmark_RELEASE" / "dataset")
    assert len(seg.image_index) == 2
