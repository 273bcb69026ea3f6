"""Datasets, loader, and the mAP^r evaluator."""

import numpy as np
import pytest

from mnc_tpu.data.eval_sds import eval_sds, print_ap_table, voc_ap
from mnc_tpu.data.loader import TrainLoader
from mnc_tpu.data.pascal_voc import get_imdb
from mnc_tpu.data.synth_imdb import SyntheticIMDB


def _blob_mask(h, w, y1, y2, x1, x2):
    m = np.zeros((h, w), np.uint8)
    m[y1:y2, x1:x2] = 1
    return m


def test_eval_sds_perfect_detections():
    gt = {
        "a": [{"class_id": 1, "mask": _blob_mask(32, 32, 2, 12, 3, 13)},
              {"class_id": 2, "mask": _blob_mask(32, 32, 18, 30, 16, 28)}],
        "b": [{"class_id": 1, "mask": _blob_mask(32, 32, 5, 20, 5, 20)}],
    }
    dets = []
    for img, lst in gt.items():
        for g in lst:
            dets.append({"image_id": img, "class_id": g["class_id"],
                         "score": 0.9, "mask": g["mask"]})
    res = eval_sds(dets, gt, num_classes=3)
    assert res["map"] == 1.0
    assert res["ap"][1] == 1.0 and res["ap"][2] == 1.0
    table = print_ap_table(res)
    assert "Mean AP^r = 1.0000" in table


def test_eval_sds_false_positive_and_miss():
    gt = {"a": [{"class_id": 1, "mask": _blob_mask(32, 32, 2, 12, 3, 13)},
                {"class_id": 1, "mask": _blob_mask(32, 32, 20, 30, 20, 30)}]}
    dets = [
        # matches gt 0
        {"image_id": "a", "class_id": 1, "score": 0.9,
         "mask": _blob_mask(32, 32, 2, 12, 3, 13)},
        # garbage (no overlap) — false positive at lower score
        {"image_id": "a", "class_id": 1, "score": 0.5,
         "mask": _blob_mask(32, 32, 0, 2, 28, 32)},
    ]
    res = eval_sds(dets, gt, num_classes=2)
    # recall reaches 0.5 with precision 1, then FP: AP = 0.5
    np.testing.assert_allclose(res["map"], 0.5, atol=1e-6)


def test_eval_sds_duplicate_detection_is_fp():
    gt = {"a": [{"class_id": 1, "mask": _blob_mask(32, 32, 2, 12, 3, 13)}]}
    m = _blob_mask(32, 32, 2, 12, 3, 13)
    dets = [{"image_id": "a", "class_id": 1, "score": s, "mask": m}
            for s in (0.9, 0.8)]
    res = eval_sds(dets, gt, num_classes=2)
    # second (claimed gt) is a false positive; AP stays 1.0 since the TP ranks first
    np.testing.assert_allclose(res["ap"][1], 1.0, atol=1e-6)


def test_voc_ap_monotone_envelope():
    rec = np.array([0.2, 0.4, 0.6])
    prec = np.array([1.0, 0.5, 0.75])
    ap = voc_ap(rec, prec)
    # envelope: [0,0.4]→1? no: first seg 0→0.2 @1.0, 0.2→0.4 @0.75, 0.4→0.6 @0.75
    np.testing.assert_allclose(ap, 0.2 * 1.0 + 0.2 * 0.75 + 0.2 * 0.75, atol=1e-6)


def test_synthetic_imdb_consistency():
    imdb = SyntheticIMDB(canvas_hw=(96, 128), num_classes=4, num_images=4)
    roidb = imdb.roidb()
    maskdb = imdb.maskdb()
    assert len(roidb) == len(maskdb) == 4
    for r, m in zip(roidb, maskdb):
        assert len(r["boxes"]) == len(m["masks"])
        assert (r["classes"] >= 1).all() and (r["classes"] < 4).all()
    gt = imdb.gt_instances()
    assert set(gt.keys()) == set(range(4))
    # full masks live inside their boxes
    ex_gt = gt[0]
    r0 = roidb[0]
    for g, box in zip(ex_gt, r0["boxes"]):
        ys, xs = np.where(g["mask"])
        assert xs.min() >= box[0] - 1 and xs.max() <= box[2] + 1
        assert ys.min() >= box[1] - 1 and ys.max() <= box[3] + 1


def test_train_loader_shapes_and_flip():
    imdb = SyntheticIMDB(canvas_hw=(96, 128), num_classes=4, num_images=4)
    loader = TrainLoader(imdb, max_gt=8, canvas_hw=(96, 128), gt_mask_size=16,
                         ims_per_batch=2, use_flipped=True, prefetch=2)
    batch = next(loader)
    assert batch["image"].shape == (2, 96, 128, 3)
    assert batch["gt_boxes"].shape == (2, 8, 4)
    assert batch["gt_masks"].shape == (2, 8, 16, 16)
    assert batch["gt_valid"].any()
    # boxes well-formed
    b = batch["gt_boxes"][batch["gt_valid"]]
    assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 127).all()


def test_make_example_zero_instances_with_mask_resize():
    """An annotation-free image with stored mask size != gt_mask_size must not
    raise in the resize-and-assign block (ADVICE r2: the g>0 guard skipped
    the resize but still assigned a (0,S,S) into (0,g,g))."""
    from mnc_tpu.data.loader import make_example

    imdb = SyntheticIMDB(canvas_hw=(96, 128), num_classes=4, num_images=2)
    entry = dict(imdb.roidb()[0])
    entry["boxes"] = np.zeros((0, 4), np.float32)
    entry["classes"] = np.zeros((0,), np.int32)
    masks = {"masks": np.zeros((0, 112, 112), np.float32)}  # != gt_mask_size
    ex = make_example(imdb, entry, masks, 0, max_gt=8, canvas_hw=(96, 128),
                      gt_mask_size=16, synthetic=True)
    assert not ex["gt_valid"].any()
    assert ex["gt_masks"].shape == (8, 16, 16)


def test_factory_names():
    imdb = get_imdb("synthetic_8")
    assert imdb.num_images == 8
    # VOC names construct lazily without data on disk
    det = get_imdb("voc_2012_train")
    assert det.num_classes == 21
    seg = get_imdb("voc_2012_seg_val")
    assert seg.name == "voc_2012_seg_val"


# ---------------------------------------------------------------------------
# COCO-style AP^r@[.5:.95] (eval_sds_averaged)
# ---------------------------------------------------------------------------

def _sq(y0, x0, size, hw=(40, 40)):
    m = np.zeros(hw, np.uint8)
    m[y0:y0 + size, x0:x0 + size] = 1
    return m


def test_eval_sds_averaged_hand_computed():
    """One gt square; one detection overlapping it with IoU 2/3 ≈ 0.667.

    The detection is a TP for thresholds {0.5, 0.55, 0.6, 0.65} (AP=1) and a
    FP for the remaining six (AP=0) → averaged AP = 4/10 = 0.4.
    """
    from mnc_tpu.data.eval_sds import eval_sds_averaged

    gt = {0: [{"class_id": 1, "mask": _sq(0, 0, 12)}]}
    # shift by 3 columns: inter 12*9=108, union 2*144-108=180, IoU=0.6 — no:
    # use overlap 2/3: shift 12x12 by width w s.t. (12-w)/ (12+w) ... compute
    # directly: shift 2 cols → inter 120, union 168, IoU 0.714 → TP at .5-.7
    det = [{"image_id": 0, "class_id": 1, "score": 0.9,
            "mask": _sq(0, 2, 12)}]
    r = eval_sds_averaged(det, gt, num_classes=2)
    # IoU = 120/168 = 0.7142857 → TP at thresholds 0.50..0.70 (5 of 10)
    assert r["ap"][1] == pytest.approx(0.5)
    assert r["map"] == pytest.approx(0.5)
    assert r["per_thresh"][0.5] == 1.0
    assert r["per_thresh"][0.75] == 0.0
    assert r["thresh"] == "0.50:0.95"


def test_eval_sds_averaged_perfect_and_miss():
    from mnc_tpu.data.eval_sds import eval_sds_averaged

    gt = {0: [{"class_id": 1, "mask": _sq(0, 0, 10)},
              {"class_id": 2, "mask": _sq(20, 20, 10)}]}
    det = [
        {"image_id": 0, "class_id": 1, "score": 0.9, "mask": _sq(0, 0, 10)},
        {"image_id": 0, "class_id": 2, "score": 0.8, "mask": _sq(0, 0, 10)},
    ]
    r = eval_sds_averaged(det, gt, num_classes=3)
    assert r["ap"][1] == pytest.approx(1.0)   # exact mask: TP at every thresh
    assert r["ap"][2] == pytest.approx(0.0)   # wrong place: FP at every thresh
    assert r["map"] == pytest.approx(0.5)


def test_imdb_evaluate_avg_key():
    from mnc_tpu.data.synth_imdb import SyntheticIMDB

    imdb = SyntheticIMDB(canvas_hw=(64, 80), num_classes=4, max_gt=3,
                         gt_mask_size=16, num_images=3, seed=5)
    gt = imdb.gt_instances()
    dets = [
        {"image_id": i, "class_id": g["class_id"], "score": 0.9, "mask": g["mask"]}
        for i, gs in gt.items() for g in gs
    ]
    res = imdb.evaluate(dets, iou_threshs=(0.5, "avg"))
    assert res[0.5]["map"] == pytest.approx(1.0)
    assert res["avg"]["map"] == pytest.approx(1.0)


def _random_eval_case(seed, n_images=12, num_classes=4, hw=(24, 32)):
    """Random dets/gt with overlapping blobby masks for matcher tests."""
    rs = np.random.RandomState(seed)
    gt, dets = {}, []
    for img in range(n_images):
        insts = []
        for _ in range(rs.randint(0, 4)):
            m = np.zeros(hw, np.uint8)
            y, x = rs.randint(0, hw[0] - 8), rs.randint(0, hw[1] - 8)
            m[y:y + rs.randint(4, 9), x:x + rs.randint(4, 9)] = 1
            insts.append({"class_id": rs.randint(1, num_classes), "mask": m})
        gt[img] = insts
        for _ in range(rs.randint(0, 5)):
            if insts and rs.rand() < 0.6:  # perturbed copy of a gt mask
                src = insts[rs.randint(len(insts))]
                m = src["mask"].copy()
                m[rs.randint(hw[0]), rs.randint(hw[1])] ^= 1
                cls = src["class_id"]
            else:
                m = np.zeros(hw, np.uint8)
                y, x = rs.randint(0, hw[0] - 6), rs.randint(0, hw[1] - 6)
                m[y:y + 5, x:x + 5] = 1
                cls = rs.randint(1, num_classes)
            dets.append({"image_id": img, "class_id": cls,
                         "score": float(rs.rand()), "mask": m})
    return dets, gt


def test_matches_decomposition_equals_eval_sds():
    """map_from_matches over each image once == eval_sds, both thresholds."""
    from mnc_tpu.data.eval_sds import eval_sds_matches, map_from_matches

    for seed in (0, 1, 2):
        dets, gt = _random_eval_case(seed)
        for thresh in (0.5, 0.7):
            ref = eval_sds(dets, gt, 4, thresh)["map"]
            m = eval_sds_matches(dets, gt, 4, thresh)
            got = map_from_matches(m, list(gt))
            assert abs(got - ref) < 1e-12, (seed, thresh, got, ref)


def test_map_from_matches_multiplicity():
    """Duplicating every image leaves mAP unchanged (paired-resample
    semantics: copies match their own gt copies independently)."""
    from mnc_tpu.data.eval_sds import eval_sds_matches, map_from_matches

    dets, gt = _random_eval_case(3)
    m = eval_sds_matches(dets, gt, 4, 0.5)
    once = map_from_matches(m, list(gt))
    twice = map_from_matches(m, list(gt) * 2)
    assert abs(once - twice) < 1e-12


def test_bootstrap_ci_sane_and_paired():
    from mnc_tpu.data.eval_sds import bootstrap_map_ci, eval_sds_matches

    dets, gt = _random_eval_case(4)
    m5 = eval_sds_matches(dets, gt, 4, 0.5)
    ids = list(gt)
    rs = np.random.RandomState(0)
    resamples = rs.randint(0, len(ids), size=(200, len(ids)))
    maps, (lo, hi) = bootstrap_map_ci(m5, ids, resamples=resamples)
    assert maps.shape == (200,) and lo <= hi
    assert 0.0 <= lo and hi <= 1.0
    # paired delta of a variant against itself is exactly zero
    maps2, _ = bootstrap_map_ci(m5, ids, resamples=resamples)
    np.testing.assert_array_equal(maps, maps2)
