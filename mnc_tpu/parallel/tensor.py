"""Tensor-parallel (+ hybrid DP×TP) sharding of the MNC fc heads.

The reference was a single-GPU 2016 CNN (SURVEY.md §2.3 marks TP "N/A"), but
the per-RoI fc stack is where MNC's parameters live — fc6 alone is
25088×4096 ≈ 100 M params, fc_mask another ~26 M at full scale — and on a
TPU pod slice the idiomatic way to scale it is a 2-D ``data×model`` mesh:
batch images shard over ``data`` (DP), the big fc matmuls shard
Megatron-style over ``model`` (column-parallel fc6/fc_mask, row-parallel
fc7/mask_pred), and XLA's SPMD partitioner inserts the all-reduces on the
ICI.  No hand-written collectives — the shardings ARE the program
(jax-ml.github.io/scaling-book recipe).

GSPMD preserves single-device semantics, so the hybrid step is numerically
the plain :func:`mnc_tpu.train.loop.build_train_step` — tested against it
leaf-for-leaf in ``tests/test_parallel.py``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel: output features shard; the following elementwise op
# (relu) stays sharded.  row-parallel: input features shard; XLA inserts the
# psum on the output, whose bias-add stays replicated.
_COL_PARALLEL = ("fc6", "fc_mask")
_ROW_PARALLEL = ("fc7", "mask_pred")


def _leaf_spec(path: str, ndim: int, model_axis: str) -> P:
    parts = path.split("/")
    if any(n in parts for n in _COL_PARALLEL):
        if ndim == 2:
            return P(None, model_axis)  # kernel (in, out): shard out
        if ndim == 1:
            return P(model_axis)  # bias rides the sharded outputs
    if any(n in parts for n in _ROW_PARALLEL):
        if ndim == 2:
            return P(model_axis, None)  # kernel (in, out): shard in
        # bias adds to the replicated (post-psum) output
    return P()


def mnc_tp_shardings(tree, mesh: Mesh, model_axis: str = "model"):
    """NamedSharding pytree for an MNC params / TrainState tree.

    Works on anything whose leaf paths mention the fc layer names — the
    params tree itself and optimizer states that mirror it (momentum traces
    etc.); every other leaf (convs, scalars, step counters) is replicated.
    """

    def spec(path, leaf):
        path_str = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                            for k in path)
        return NamedSharding(
            mesh, _leaf_spec(path_str, getattr(leaf, "ndim", 0), model_axis))

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_train_state(state, mesh: Mesh, model_axis: str = "model"):
    """Place a TrainState on the mesh with the TP param/opt shardings."""
    return jax.device_put(state, mnc_tp_shardings(state, mesh, model_axis))


def hybrid_parallel_train_step(model, tx, arch, train_cfg, mesh: Mesh,
                               data_axis: str = "data",
                               model_axis: str = "model",
                               donate: bool = True):
    """DP×TP train step via GSPMD auto-partitioning.

    Usage::

        mesh = make_mesh({"data": 2, "model": 4})
        state = shard_train_state(TrainState.create(params, tx), mesh)
        batch = shard_batch(batch, mesh)          # leading axis over "data"
        step = hybrid_parallel_train_step(model, tx, arch, train_cfg, mesh)
        state, metrics = step(state, batch, key)

    The step body is the plain single-device program; the committed input
    placements (``shard_train_state`` / ``shard_batch``) seed GSPMD, which
    partitions everything downstream (fc matmuls, grads, optimizer update)
    to match and inserts the ICI collectives.
    """
    from mnc_tpu.train.loop import build_train_step

    del data_axis, model_axis  # carried by the inputs' committed shardings
    step = build_train_step(model, tx, arch, train_cfg)
    return jax.jit(step, donate_argnums=(0,) if donate else ())
