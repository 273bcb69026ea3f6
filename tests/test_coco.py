"""COCO loader: RLE/polygon decoding + end-to-end on a tiny fabricated JSON."""

import json

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
