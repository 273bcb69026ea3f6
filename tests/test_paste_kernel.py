"""Fused paste+binarize Pallas kernel vs the einsum path.

The kernel (ops/pallas/paste_kernel.py) must reproduce paste_masks's
geometry exactly — it shares _paste_axis_weights — and its f32 product may
disagree with a reference product only within float eps of the binarize
threshold.  Runs in interpret mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnc_tpu.ops.masks import paste_masks

CANVAS = (96, 128)
M = 28


def _rand_dets(rs, n, h, w):
    x1 = rs.uniform(-10, w - 5, n)
    y1 = rs.uniform(-10, h - 5, n)
    boxes = np.stack(
        [x1, y1, x1 + rs.uniform(4, 60, n), y1 + rs.uniform(4, 40, n)], 1
    ).astype(np.float32)
    masks = rs.uniform(size=(n, M, M)).astype(np.float32)
    return jnp.asarray(masks), jnp.asarray(boxes)


def _assert_matches_f32_reference(masks, boxes, thresh=0.4):
    got = np.asarray(paste_masks(masks, boxes, CANVAS, thresh, impl="pallas"))
    assert got.dtype == np.bool_
    ref_prod = np.asarray(paste_masks(masks, boxes, CANVAS, None))  # f32 path
    want = ref_prod > thresh
    mism = got != want
    # legal disagreement: only where the f32 product sits within eps of the
    # threshold (accumulation-order differences between dot and einsum)
    assert np.abs(ref_prod[mism] - thresh).max(initial=0.0) < 1e-5
    assert mism.mean() < 1e-4


def test_paste_pallas_matches_f32_einsum(rng):
    masks, boxes = _rand_dets(rng, 16, *CANVAS)
    _assert_matches_f32_reference(masks, boxes)


def test_paste_pallas_degenerate_and_outside_boxes(rng):
    # zero-area, fully-outside, and inverted boxes must not crash and must
    # agree with the einsum geometry (all-False rows for outside boxes)
    boxes = jnp.asarray(
        np.array(
            [
                [0.0, 0.0, 0.0, 0.0],
                [-50.0, -50.0, -20.0, -20.0],
                [200.0, 200.0, 400.0, 400.0],  # beyond canvas
                [30.0, 20.0, 10.0, 5.0],  # inverted
            ],
            np.float32,
        )
    )
    masks = jnp.ones((4, M, M), jnp.float32)
    _assert_matches_f32_reference(masks, boxes)


def test_paste_pallas_constant_mask_geometry():
    # a constant-1 mask binarizes to exactly the box's inside-pixel set
    boxes = jnp.asarray(np.array([[10.0, 8.0, 40.0, 30.0]], np.float32))
    masks = jnp.ones((1, M, M), jnp.float32)
    out = np.asarray(paste_masks(masks, boxes, CANVAS, 0.4, impl="pallas"))[0]
    ys, xs = np.nonzero(out)
    # inside test is t in [0, 1): pixel p inside iff lo - 0.5 <= p < hi + 0.5
    assert ys.min() == 8 and ys.max() == 30
    assert xs.min() == 10 and xs.max() == 40
    assert out[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1].all()


def test_paste_pallas_vmap(rng):
    # postprocess_detections is vmapped over the image batch; the kernel
    # must batch (Pallas lifts vmap onto the grid)
    masks0, boxes0 = _rand_dets(rng, 8, *CANVAS)
    masks1, boxes1 = _rand_dets(rng, 8, *CANVAS)
    masks = jnp.stack([masks0, masks1])
    boxes = jnp.stack([boxes0, boxes1])
    fn = jax.vmap(lambda s, b: paste_masks(s, b, CANVAS, 0.4, impl="pallas"))
    got = np.asarray(fn(masks, boxes))
    for i in range(2):
        one = np.asarray(paste_masks(masks[i], boxes[i], CANVAS, 0.4, impl="pallas"))
        np.testing.assert_array_equal(got[i], one)


def test_paste_impl_knob_reaches_postprocess(rng):
    # PostCfg.paste_impl="pallas" must produce the same detections dict as
    # einsum (canvas_masks compared with the threshold-margin rule)
    from mnc_tpu.pipeline.inference import PostCfg, postprocess_detections

    n, c = 24, 4
    rois = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 100, n),
                rng.uniform(0, 70, n),
                rng.uniform(0, 100, n) + 20,
                rng.uniform(0, 70, n) + 15,
            ],
            1,
        ).astype(np.float32)
    )
    valid = jnp.ones((n,), bool)
    cls_prob = jax.nn.softmax(jnp.asarray(rng.randn(n, c).astype(np.float32)), -1)
    mask_logits = jnp.asarray(rng.randn(n, M, M).astype(np.float32))

    outs = {}
    for impl in ("einsum", "pallas"):
        post = PostCfg(dets_per_class=4, max_per_image=8, paste_impl=impl)
        outs[impl] = jax.tree.map(
            np.asarray,
            postprocess_detections(rois, valid, cls_prob, mask_logits, post, CANVAS),
        )
    for key in ("boxes", "scores", "classes", "masks", "valid"):
        np.testing.assert_array_equal(outs["einsum"][key], outs["pallas"][key])
    a = outs["einsum"]["canvas_masks"]
    b = outs["pallas"]["canvas_masks"]
    assert a.shape == b.shape
    assert (a != b).mean() < 1e-3  # bf16-vs-f32 threshold pixels only


def test_paste_impl_auto_resolves():
    # "auto" = einsum everywhere: XLA fuses the binarize into the einsum
    # epilogue and beats the kernel on v5e (paste_kernel.py docstring)
    from mnc_tpu.pipeline.inference import PostCfg

    assert PostCfg().resolved_paste_impl() == "einsum"
    assert PostCfg(paste_impl="pallas").resolved_paste_impl() == "pallas"


def test_paste_pallas_without_thresh_falls_back_to_float():
    # the kernel only exists for the binarized path; a float request under
    # impl="pallas" silently uses the f32 einsum
    out = paste_masks(
        jnp.ones((2, M, M)), jnp.zeros((2, 4)), CANVAS, None, impl="pallas"
    )
    assert out.dtype == jnp.float32
