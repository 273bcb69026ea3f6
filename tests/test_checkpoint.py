"""Checkpoint/restore roundtrip + bbox un-normalization export semantics."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from mnc_tpu.models.mnc import MNC, MNCArch
from mnc_tpu.train.loop import TrainState
from mnc_tpu.train.optim import make_optimizer
from mnc_tpu.utils import checkpoint as ck

ARCH = MNCArch(canvas=(64, 96), anchor_scales=(1, 2, 4), num_classes=4,
               mask_size=9, warp_hw=4, n_stages=3, compute_dtype=jnp.float32,
               fc_dim=32, mask_fc_dim=16, pre_nms_top_n=32, post_nms_top_n=8,
               rpn_min_size=4.0)


def _mk_state():
    model = MNC(arch=ARCH)
    img = jnp.zeros((*ARCH.canvas, 3), jnp.float32)
    info = jnp.array([64.0, 96.0, 1.0])
    params = model.init(jax.random.PRNGKey(0), img, info)
    tx = make_optimizer(params)
    return model, TrainState.create(params, tx)


def test_save_restore_roundtrip(tmp_path):
    model, state = _mk_state()
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    path = ck.save_checkpoint(str(tmp_path), state)
    assert osp.basename(path) == "ckpt_00000007"

    _, template = _mk_state()
    restored, step = ck.restore_latest(str(tmp_path), template)
    assert step == 7
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_restore_latest_empty_dir(tmp_path):
    _, template = _mk_state()
    state, step = ck.restore_latest(str(tmp_path / "nothing"), template)
    assert step == 0 and state is template


def test_pruning(tmp_path):
    _, state = _mk_state()
    for s in range(7):
        ck.save_checkpoint(str(tmp_path), state._replace(step=jnp.asarray(s)), keep=3)
    import os

    cks = sorted(d for d in os.listdir(tmp_path) if d.startswith("ckpt_"))
    assert len(cks) == 3 and cks[-1] == "ckpt_00000006"


def test_export_unnormalizes_bbox_pred():
    """export_params folds target stats into bbox_pred so the exported model
    emits raw deltas — the reference SolverWrapper.snapshot behavior."""
    model, state = _mk_state()
    means = (0.0, 0.1, -0.1, 0.2)
    stds = (0.1, 0.1, 0.2, 0.2)
    exported = ck.export_params(state.params, means, stds)

    # Compare: normalized prediction × stds + means == exported raw prediction
    rs = np.random.RandomState(0)
    feat = jnp.asarray(rs.randn(5, 4, 4, 512).astype(np.float32))
    mask_logits = jnp.asarray(rs.randn(5, 9, 9).astype(np.float32))

    def classify(p):
        return model.apply(p, feat, mask_logits, method=MNC.classify_stage)

    _, bbox_norm = classify(state.params)
    _, bbox_raw = classify(jax.tree.map(jnp.asarray, exported))
    n_cls = ARCH.num_classes
    want = (np.asarray(bbox_norm).reshape(5, n_cls, 4) * np.asarray(stds)
            + np.asarray(means)).reshape(5, 4 * n_cls)
    np.testing.assert_allclose(np.asarray(bbox_raw), want, rtol=1e-4, atol=1e-4)


def test_renormalize_inverts_export():
    """renormalize_bbox_pred is the exact inverse of export_params — the
    fine-tune-from-reference-snapshot path (ADVICE r2)."""
    _, state = _mk_state()
    means = (0.0, 0.1, -0.1, 0.2)
    stds = (0.1, 0.1, 0.2, 0.2)
    roundtrip = ck.renormalize_bbox_pred(
        ck.export_params(state.params, means, stds), means, stds)
    for x, y in zip(jax.tree.leaves(state.params), jax.tree.leaves(roundtrip)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_npz_roundtrip(tmp_path):
    _, state = _mk_state()
    path = str(tmp_path / "params.npz")
    ck.save_npz(path, state.params)
    loaded = ck.load_npz(path)
    for x, y in zip(jax.tree.leaves(state.params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_reproduces_training(tmp_path):
    """Crash-resume equivalence: save at step k, continue vs restore-continue
    with identical keys → identical parameters (the failure-recovery story)."""
    import jax

    from mnc_tpu.data.synthetic import SyntheticShapes
    from mnc_tpu.train.loop import make_train_step

    arch = ARCH
    model, state = _mk_state()
    tx = make_optimizer(state.params)
    state = ck.restore_latest(str(tmp_path), TrainState.create(state.params, tx))[0]
    train_cfg = dict(RPN_POSITIVE_OVERLAP=0.7, RPN_NEGATIVE_OVERLAP=0.3,
                     RPN_BATCHSIZE=32, RPN_FG_FRACTION=0.5, BATCH_SIZE=16,
                     FG_FRACTION=0.25, FG_THRESH=0.5, BG_THRESH_HI=0.5,
                     BG_THRESH_LO=0.0)
    data = SyntheticShapes(canvas_hw=arch.canvas, num_classes=arch.num_classes,
                           max_gt=4, gt_mask_size=16, n_range=(1, 2), seed=4)
    step = make_train_step(model, tx, arch, train_cfg, donate=False)

    def batch(i):
        return {k: jnp.asarray(v) for k, v in data.example(i).items()}

    keys = [jax.random.PRNGKey(i) for i in range(5)]
    for i in range(3):
        state, _ = step(state, batch(i), keys[i])
    path = ck.save_checkpoint(str(tmp_path), state)

    cont = state
    for i in range(3, 5):
        cont, _ = step(cont, batch(i), keys[i])

    restored = ck.restore_checkpoint(path, TrainState.create(state.params, tx))
    for i in range(3, 5):
        restored, _ = step(restored, batch(i), keys[i])

    for a, b in zip(jax.tree.leaves(cont.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_is_deterministic():
    """Same seed + data → bitwise-identical metrics (jit purity; the TPU
    answer to the reference era's nondeterminism)."""
    import jax

    from mnc_tpu.data.synthetic import SyntheticShapes
    from mnc_tpu.train.loop import make_train_step

    model, state = _mk_state()
    tx = make_optimizer(state.params)
    train_cfg = dict(RPN_POSITIVE_OVERLAP=0.7, RPN_NEGATIVE_OVERLAP=0.3,
                     RPN_BATCHSIZE=32, RPN_FG_FRACTION=0.5, BATCH_SIZE=16,
                     FG_FRACTION=0.25, FG_THRESH=0.5, BG_THRESH_HI=0.5,
                     BG_THRESH_LO=0.0)
    data = SyntheticShapes(canvas_hw=ARCH.canvas, num_classes=ARCH.num_classes,
                           max_gt=4, gt_mask_size=16, n_range=(1, 2), seed=4)
    step = make_train_step(model, tx, ARCH, train_cfg, donate=False)
    batch = {k: jnp.asarray(v) for k, v in data.example(0).items()}

    s1 = TrainState.create(state.params, tx)
    _, m1 = step(s1, batch, jax.random.PRNGKey(9))
    s2 = TrainState.create(state.params, tx)
    _, m2 = step(s2, batch, jax.random.PRNGKey(9))
    assert float(m1["total"]) == float(m2["total"])
