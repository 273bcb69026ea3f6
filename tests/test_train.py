"""Training: target assignment semantics, gradient flow, loss-decreases smoke.

The 50-iter fixed-seed smoke of SURVEY.md §4, shrunk to stay fast on the CPU
mesh: tiny canvas, tiny trunk features, a handful of steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnc_tpu.data.synthetic import SyntheticShapes
from mnc_tpu.models.mnc import MNC, MNCArch
from mnc_tpu.ops.anchors import shifted_anchors
from mnc_tpu.train import anchor_targets, proposal_targets
from mnc_tpu.train.loop import TrainState, make_train_step, mnc_loss
from mnc_tpu.train.optim import make_optimizer

ARCH = MNCArch(
    canvas=(128, 160),
    anchor_scales=(2, 4, 8),
    num_classes=4,
    mask_size=9,
    warp_hw=4,
    n_stages=5,
    compute_dtype=jnp.float32,
    fc_dim=64,
    mask_fc_dim=32,
    pre_nms_top_n=128,
    post_nms_top_n=32,
    rpn_min_size=4.0,
)
TRAIN_CFG = dict(
    RPN_POSITIVE_OVERLAP=0.7, RPN_NEGATIVE_OVERLAP=0.3, RPN_BATCHSIZE=64,
    RPN_FG_FRACTION=0.5, BATCH_SIZE=32, FG_FRACTION=0.25, FG_THRESH=0.5,
    BG_THRESH_HI=0.5, BG_THRESH_LO=0.0,
)
DATA = SyntheticShapes(canvas_hw=ARCH.canvas, num_classes=ARCH.num_classes,
                       max_gt=4, gt_mask_size=16, n_range=(1, 2), seed=7)


def _jnp_batch(ex):
    return {k: jnp.asarray(v) for k, v in ex.items()}


def test_anchor_targets_semantics():
    anchors = jnp.asarray(shifted_anchors(8, 10, 16, scales=(2, 4, 8)))
    gt = jnp.asarray(np.array([[40.0, 30.0, 120.0, 90.0]], np.float32))
    at = anchor_targets(anchors, gt, jnp.array([True]), (128.0, 160.0),
                        jax.random.PRNGKey(0), batch_size=64)
    labels = np.asarray(at.labels)
    assert (labels == 1).sum() >= 1  # at least the per-gt argmax anchor
    assert (labels == 0).sum() > 0
    assert (labels == 1).sum() <= 32
    assert ((labels == 1).sum() + (labels == 0).sum()) <= 64
    # positive anchors carry nonzero inside weights; negatives don't
    iw = np.asarray(at.bbox_inside_w)
    assert (iw[labels == 1] == 1.0).all()
    assert (iw[labels != 1] == 0.0).all()
    # outside weights uniform over the sampled batch
    ow = np.asarray(at.bbox_outside_w)
    n_batch = (labels >= 0).sum()
    np.testing.assert_allclose(ow[labels >= 0], 1.0 / n_batch, rtol=1e-5)


def test_anchor_targets_outside_anchors_ignored():
    anchors = jnp.asarray(shifted_anchors(8, 10, 16, scales=(2, 4, 8)))
    gt = jnp.asarray(np.array([[40.0, 30.0, 120.0, 90.0]], np.float32))
    at = anchor_targets(anchors, gt, jnp.array([True]), (128.0, 160.0),
                        jax.random.PRNGKey(0))
    a = np.asarray(anchors)
    outside = (a[:, 0] < 0) | (a[:, 1] < 0) | (a[:, 2] >= 160) | (a[:, 3] >= 128)
    assert (np.asarray(at.labels)[outside] == -1).all()


def test_proposal_targets_semantics():
    rs = np.random.RandomState(0)
    gt_boxes = jnp.asarray(np.array([[20.0, 20.0, 70.0, 80.0]], np.float32))
    gt_cls = jnp.asarray(np.array([2], np.int32))
    gt_valid = jnp.array([True])
    gt_masks = jnp.ones((1, 16, 16))
    # proposals: some near gt, some far
    rois = np.concatenate([
        np.array([[22.0, 18.0, 68.0, 78.0], [25.0, 25.0, 75.0, 85.0]], np.float32),
        np.abs(rs.uniform(90, 140, size=(20, 2))).repeat(2, 1).astype(np.float32)
        + np.array([0, 0, 10, 12], np.float32),
    ])
    tgt = proposal_targets(
        jnp.asarray(rois), jnp.ones(len(rois), bool), gt_boxes, gt_cls, gt_valid,
        gt_masks, jax.random.PRNGKey(1), roi_batch=16, mask_size=9,
    )
    labels = np.asarray(tgt.labels)
    # the two near-gt rois and the appended gt box itself are fg with class 2
    assert (labels == 2).sum() >= 2
    assert (labels == 0).sum() > 0
    # fg rois have mask weight 1 and nonzero mask targets
    w = np.asarray(tgt.mask_weight)
    assert (w[labels == 2] == 1.0).all() and (w[labels != 2] == 0.0).all()
    assert np.asarray(tgt.mask_targets)[labels == 2].sum() > 0


@pytest.fixture(scope="module")
def model_params():
    model = MNC(arch=ARCH)
    ex = _jnp_batch(DATA.example(0))
    params = model.init(jax.random.PRNGKey(0), ex["image"], ex["im_info"])
    return model, params


def test_downstream_grads_reach_rpn_bbox(model_params):
    """The MNC signature property: stage-2/3 losses alone (no RPN loss) must
    produce gradients in rpn_bbox_pred, via roi_warp's box-coordinate VJP."""
    model, params = model_params
    anchors = jnp.asarray(ARCH.all_anchors())
    batch = _jnp_batch(DATA.example(1))

    def downstream_only(p):
        _, losses = mnc_loss(p, model, batch, jax.random.PRNGKey(3), ARCH,
                             anchors, TRAIN_CFG)
        return losses["s23_mask"] + losses["s23_cls"] + losses["s23_bbox"]

    g = jax.grad(downstream_only)(params)
    gk = np.asarray(g["params"]["rpn_head"]["rpn_bbox_pred"]["kernel"])
    assert np.abs(gk).max() > 0.0


def test_train_smoke_loss_decreases(model_params):
    model, params = model_params
    tx = make_optimizer(params, base_lr=0.002, stepsize=10000)
    step = make_train_step(model, tx, ARCH, TRAIN_CFG, donate=False)
    state = TrainState.create(params, tx)
    key = jax.random.PRNGKey(42)
    losses = []
    for it in range(8):
        key, k = jax.random.split(key)
        batch = _jnp_batch(DATA.example(it % 4))
        state, metrics = step(state, batch, k)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_train_step_batched_images(model_params):
    model, params = model_params
    tx = make_optimizer(params)
    step = make_train_step(model, tx, ARCH, TRAIN_CFG, donate=False)
    state = TrainState.create(params, tx)
    batch = {k: jnp.asarray(v) for k, v in DATA.batch([0, 1]).items()}
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total"]))


def test_optimizer_caffe_rules():
    """Bias params: 2x lr, no weight decay; kernels: decay applied."""
    import optax

    from mnc_tpu.train.optim import make_optimizer, step_lr

    params = {"layer": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}}
    tx = make_optimizer(params, base_lr=1.0, momentum=0.0, weight_decay=0.5,
                        gamma=0.1, stepsize=100)
    state = tx.init(params)
    grads = {"layer": {"kernel": jnp.full((4, 4), 0.1), "bias": jnp.full((4,), 0.1)}}
    updates, _ = tx.update(grads, state, params)
    # kernel: -(0.1 + 0.5*1.0) ; bias: -(0.1*2)
    np.testing.assert_allclose(np.asarray(updates["layer"]["kernel"]), -0.6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["layer"]["bias"]), -0.2, rtol=1e-6)
    # step schedule decays by gamma at stepsize
    s = step_lr(1.0, 0.1, 100)
    assert float(s(0)) == 1.0 and abs(float(s(100)) - 0.1) < 1e-6


def test_optimizer_clip_gradients():
    from mnc_tpu.train.optim import make_optimizer

    params = {"w": {"kernel": jnp.zeros((3,))}}
    tx = make_optimizer(params, base_lr=1.0, momentum=0.0, weight_decay=0.0,
                        clip_gradients=1.0)
    state = tx.init(params)
    grads = {"w": {"kernel": jnp.array([30.0, 40.0, 0.0])}}  # norm 50
    updates, _ = tx.update(grads, state, params)
    got = -np.asarray(updates["w"]["kernel"])
    np.testing.assert_allclose(np.linalg.norm(got), 1.0, rtol=1e-5)


def test_remat_trunk_matches_plain():
    """remat_trunk changes memory, not math: identical loss & grads."""
    arch_a = ARCH
    arch_b = MNCArch(**{**ARCH.__dict__, "remat_trunk": True})
    batch = _jnp_batch(DATA.example(2))
    anchors = jnp.asarray(ARCH.all_anchors())

    def run(arch):
        model = MNC(arch=arch)
        params = model.init(jax.random.PRNGKey(0), batch["image"],
                            batch["im_info"])
        total, _ = mnc_loss(params, model, batch, jax.random.PRNGKey(1), arch,
                            anchors, TRAIN_CFG)
        g = jax.grad(lambda p: mnc_loss(p, model, batch, jax.random.PRNGKey(1),
                                        arch, anchors, TRAIN_CFG)[0])(params)
        return float(total), g

    ta, ga = run(arch_a)
    tb, gb = run(arch_b)
    np.testing.assert_allclose(ta, tb, rtol=1e-5)
    la, lb = jax.tree.leaves(ga), jax.tree.leaves(gb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4,
                                   atol=1e-5)


def test_train_step_with_empty_gt():
    """An image with zero instances must train (pure-background step)."""
    model = MNC(arch=ARCH)
    ex = DATA.example(0)
    ex = {k: np.array(v) for k, v in ex.items()}
    ex["gt_valid"][:] = False
    ex["gt_boxes"][:] = 0
    ex["gt_classes"][:] = 0
    ex["gt_masks"][:] = 0
    batch = _jnp_batch(ex)
    params = model.init(jax.random.PRNGKey(0), batch["image"], batch["im_info"])
    tx = make_optimizer(params)
    step = make_train_step(model, tx, ARCH, TRAIN_CFG, donate=False)
    state = TrainState.create(params, tx)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    assert float(metrics["s23_mask"]) == 0.0  # no fg → no mask loss


def test_random_keep_equals_argsort_rank():
    """The top_k-based subsample selection (train/targets.py::_random_keep)
    must pick EXACTLY the same elements as the original full-argsort rank
    formulation — same uniform keys, same lowest-index tie-break — so the
    r4 speedup cannot change any training draw."""
    from mnc_tpu.train.targets import _random_keep

    def argsort_keep(key, eligible, quota):
        r = jax.random.uniform(key, eligible.shape)
        r = jnp.where(eligible, r, 2.0)
        order = jnp.argsort(r)
        ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
        return eligible & (ranks < quota)

    rng = np.random.RandomState(0)
    for trial in range(8):
        n = int(rng.choice([5, 64, 257, 2048]))
        max_q = int(rng.choice([1, 16, 128, 256]))
        quota = int(rng.randint(0, max_q + 1))
        # eligibility mixes dense, sparse, and empty cases
        p = [1.0, 0.5, 0.05, 0.0][trial % 4]
        eligible = jnp.asarray(rng.rand(n) < p)
        key = jax.random.PRNGKey(trial)
        got = _random_keep(key, eligible, quota, max_q)
        want = argsort_keep(key, eligible, quota)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert int(jnp.sum(got)) == min(quota, int(jnp.sum(eligible)))
