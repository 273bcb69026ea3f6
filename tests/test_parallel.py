"""Data parallelism on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnc_tpu.data.synthetic import SyntheticShapes
from mnc_tpu.models.mnc import MNC, MNCArch
from mnc_tpu.parallel import (
    data_parallel_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from mnc_tpu.train.loop import TrainState, make_train_step
from mnc_tpu.train.optim import make_optimizer

ARCH = MNCArch(
    canvas=(96, 128),
    anchor_scales=(2, 4, 8),
    num_classes=4,
    mask_size=9,
    warp_hw=4,
    n_stages=3,
    compute_dtype=jnp.float32,
    fc_dim=48,
    mask_fc_dim=24,
    pre_nms_top_n=64,
    post_nms_top_n=16,
    rpn_min_size=4.0,
)
TRAIN_CFG = dict(
    RPN_POSITIVE_OVERLAP=0.7, RPN_NEGATIVE_OVERLAP=0.3, RPN_BATCHSIZE=64,
    RPN_FG_FRACTION=0.5, BATCH_SIZE=32, FG_FRACTION=0.25, FG_THRESH=0.5,
    BG_THRESH_HI=0.5, BG_THRESH_LO=0.0,
)
DATA = SyntheticShapes(canvas_hw=ARCH.canvas, num_classes=ARCH.num_classes,
                       max_gt=4, gt_mask_size=16, n_range=(1, 2), seed=5)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


@pytest.fixture(scope="module")
def setup():
    model = MNC(arch=ARCH)
    ex = DATA.example(0)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ex["image"]),
                        jnp.asarray(ex["im_info"]))
    tx = make_optimizer(params)
    return model, params, tx


def test_dp_step_runs_and_syncs(setup):
    model, params, tx = setup
    mesh = make_mesh()
    step = data_parallel_train_step(model, tx, ARCH, TRAIN_CFG, mesh, donate=False)
    state = replicate(TrainState.create(params, tx), mesh)
    batch = shard_batch({k: jnp.asarray(v) for k, v in DATA.batch(range(8)).items()},
                        mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total"]))
    # params stay replicated (identical across devices)
    kernel = state.params["params"]["rpn_head"]["rpn_bbox_pred"]["kernel"]
    shards = [np.asarray(s.data) for s in kernel.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_grad_equals_single_device_mean(setup):
    """DP over 8 chips with per-chip batch 1 == single-device batch-8 step
    (same RNG per image → same targets → identical averaged gradients)."""
    model, params, tx = setup
    mesh = make_mesh()

    # Single-device reference: batch of 8 images, vmapped.
    sstep = make_train_step(model, tx, ARCH, TRAIN_CFG, donate=False)
    s0 = TrainState.create(params, tx)
    batch = {k: jnp.asarray(v) for k, v in DATA.batch(range(8)).items()}
    key = jax.random.PRNGKey(7)
    s1, m1 = sstep(s0, batch, key)

    # DP derives per-image keys by global index (split over the global batch,
    # slice the shard's range) — exactly vmap's split — so targets match per
    # image and the psum-averaged step equals the single-device step up to
    # float reassociation (mean-of-shard-means vs one global mean).
    dstep = data_parallel_train_step(model, tx, ARCH, TRAIN_CFG, mesh, donate=False)
    d0 = replicate(TrainState.create(params, tx), mesh)
    d1, m2 = dstep(d0, shard_batch(batch, mesh), key)
    np.testing.assert_allclose(float(m2["total"]), float(m1["total"]),
                               rtol=1e-5)
    for k2, v2 in jax.device_get(m2).items():
        np.testing.assert_allclose(
            float(v2), float(jax.device_get(m1)[k2]), rtol=1e-4, atol=1e-6,
            err_msg=f"metric {k2} diverged between DP and single-device")
    # post-step parameter trees agree leaf-for-leaf
    flat1 = jax.tree_util.tree_leaves_with_path(jax.device_get(s1.params))
    flat2 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(jax.device_get(d1.params))}
    for path, v1 in flat1:
        np.testing.assert_allclose(
            flat2[jax.tree_util.keystr(path)], v1, rtol=5e-4, atol=1e-6,
            err_msg=f"param {jax.tree_util.keystr(path)} diverged")


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = {k: jnp.asarray(v) for k, v in DATA.batch(range(8)).items()}
    sharded = shard_batch(batch, mesh)
    for v in sharded.values():
        assert len(v.addressable_shards) == 8
        assert v.addressable_shards[0].data.shape[0] == 1


def test_dp_eval_step_matches_single_device(setup):
    """data_parallel_eval_step shards batched inference over the mesh and
    returns exactly what a single-device vmap of the same runner returns."""
    from mnc_tpu.parallel import data_parallel_eval_step
    from mnc_tpu.pipeline.inference import MNCPipeline, PostCfg

    model, params, tx = setup
    mesh = make_mesh()
    pipe = MNCPipeline(model, params,
                       PostCfg(dets_per_class=4, max_per_image=8, paste=False))
    batch = DATA.batch(range(8))
    images = jnp.asarray(batch["image"])
    infos = jnp.asarray(batch["im_info"])

    ref = jax.device_get(jax.vmap(pipe._run, in_axes=(None, 0, 0))(
        params, images, infos))
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = data_parallel_eval_step(pipe._run, mesh)
    got = jax.device_get(dp(
        replicate(params, mesh),
        jax.device_put(images, NamedSharding(mesh, P("data"))),
        jax.device_put(infos, NamedSharding(mesh, P("data")))))
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_init_distributed_two_process_psum(tmp_path):
    """Multi-host DCN path: two real processes join via init_distributed
    (coordination service on localhost), form one GLOBAL mesh, and a
    cross-process psum over gloo returns the global device count.  This is
    the 2-process CPU stand-in for multi-host TPU (SURVEY.md §2.3 DCN row)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    env = dict(os.environ)
    # one CPU device per process (conftest's 8-way split is per-process and
    # would make the expected psum 16; keep the smoke minimal + fast)
    env["XLA_FLAGS"] = ""
    procs = [subprocess.Popen(
        [sys.executable, worker, f"localhost:{port}", str(i), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"DIST_OK proc={i} nproc=2 ndev=2" in out, out


def test_spatial_trunk_partitioning_matches_single_device(setup):
    """Height-sharded trunk (XLA SPMD halo exchange) == unsharded trunk."""
    from mnc_tpu.models.mnc import MNC
    from mnc_tpu.parallel.spatial import shard_image, spatial_trunk_features

    model, params, tx = setup
    # the FEATURE map height (canvas_h/16 = 6) must divide over the axis:
    # use 2 of the 8 virtual devices
    mesh = make_mesh(axes={"data": 2}, devices=jax.devices()[:2])
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(*ARCH.canvas, 3).astype(np.float32) * 20)

    ref = jax.jit(lambda p, im: model.apply(p, im, method=MNC.features))(
        params, img)
    fn = spatial_trunk_features(model, mesh)
    out = fn(params, shard_image(img, mesh))
    assert len(out.addressable_shards) == 2
    assert out.addressable_shards[0].data.shape[0] == ref.shape[0] // 2
    np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                               np.asarray(jax.device_get(ref)),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_dp_tp_matches_single_device(setup):
    """2×4 data×model mesh (GSPMD, Megatron-split fc heads) == the plain
    single-device step, leaf for leaf — and the fc kernels actually shard."""
    from jax.sharding import PartitionSpec as P

    from mnc_tpu.parallel import hybrid_parallel_train_step, shard_train_state

    model, params, tx = setup
    mesh = make_mesh({"data": 2, "model": 4})

    sstep = make_train_step(model, tx, ARCH, TRAIN_CFG, donate=False)
    s0 = TrainState.create(params, tx)
    batch = {k: jnp.asarray(v) for k, v in DATA.batch(range(8)).items()}
    key = jax.random.PRNGKey(11)
    s1, m1 = sstep(s0, batch, key)

    hstep = hybrid_parallel_train_step(model, tx, ARCH, TRAIN_CFG, mesh,
                                       donate=False)
    h0 = shard_train_state(TrainState.create(params, tx), mesh)
    # input placement: fc6 kernel column-sharded, fc7 row-sharded
    fc = h0.params["params"]["classify_head"]
    assert fc["fc6"]["kernel"].sharding.spec == P(None, "model")
    assert fc["fc7"]["kernel"].sharding.spec == P("model", None)
    h1, m2 = hstep(h0, shard_batch(batch, mesh), key)

    # GSPMD preserves semantics; only float reassociation differs (split
    # matmul partial sums)
    np.testing.assert_allclose(float(m2["total"]), float(m1["total"]),
                               rtol=1e-4)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(s1.params)),
            jax.tree_util.tree_leaves_with_path(jax.device_get(h1.params))):
        assert p1 == p2
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=str(p1))
    # updated params keep the TP layout (no silent re-replication)
    out_fc = h1.params["params"]["classify_head"]
    assert out_fc["fc6"]["kernel"].sharding.spec == P(None, "model")


def test_test_net_dp_cli_smoke(tmp_path):
    """tools/test_net.py --dp shards --eval-batch over the (8-device CPU)
    mesh end-to-end: the CLI prints the shard banner and the reference-style
    AP table (random weights — the claim is plumbing, not mAP)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "test_net.py"),
         "--cpu", "--dp", "--eval-batch", "8", "--imdb", "synthetic_16",
         "--set", "NET.FC_DIM", "96", "NET.MASK_FC_DIM", "32",
         "NET.N_STAGES", "3",
         "TEST.RPN_PRE_NMS_TOP_N", "96", "STATIC.TEST_PRE_NMS_TOP_N", "96",
         "TEST.RPN_POST_NMS_TOP_N", "16", "STATIC.TEST_POST_NMS_TOP_N", "16"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "sharded over 8 devices" in out.stdout, out.stdout
    assert "mAP^r@0.5" in out.stdout, out.stdout
