"""Image preprocessing: the reference scale rule + canvas padding."""

import numpy as np

from mnc_tpu.utils.blob import im_list_to_blob, im_scale_for, prep_im_for_blob


def test_scale_rule_reference_semantics():
    # shorter side → 600 when the long side stays under 1000
    assert abs(im_scale_for((375, 500), 600, 1000, (640, 1024)) - 600 / 375) < 1e-6
    # long-side cap: 600*2000/500 = 2400 > 1000 → scale = 1000/2000
    assert abs(im_scale_for((500, 2000), 600, 1000, (640, 1024)) - 0.5) < 1e-6
    # canvas cap: portrait image must fit 640 rows
    s = im_scale_for((1000, 600), 600, 1000, (640, 1024))
    assert s <= 640 / 1000 + 1e-9


def test_prep_im_for_blob_shapes_and_mean():
    img = np.full((100, 150, 3), 120.0, np.float32)
    canvas, info = prep_im_for_blob(img, target_size=60, max_size=100,
                                    canvas_hw=(96, 128))
    assert canvas.shape == (96, 128, 3)
    sh, sw, scale = int(info[0]), int(info[1]), float(info[2])
    assert sh <= 96 and sw <= 128
    assert abs(scale - min(60 / 100, 100 / 150, 96 / 100, 128 / 150)) < 1e-6
    # mean-subtracted: scaled region is 120 - mean, padding is 0
    from mnc_tpu.config import cfg

    want = 120.0 - cfg.PIXEL_MEANS.ravel()
    np.testing.assert_allclose(canvas[0, 0], want, atol=1.0)
    assert np.all(canvas[sh:, :] == 0) and np.all(canvas[:, sw:] == 0)


def test_im_list_to_blob():
    ims = [np.zeros((32, 48, 3), np.float32)] * 3
    blob = im_list_to_blob(ims)
    assert blob.shape == (3, 32, 48, 3)
