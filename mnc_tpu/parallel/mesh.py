"""Data-parallel training/eval over a ``jax.sharding.Mesh``.

TPU-native replacement for the reference's multi-GPU machinery
(``caffe-mnc/src/caffe/parallel.cpp`` ``P2PSync`` — a host-driven CUDA
peer-to-peer tree allreduce): per-chip image batches, gradients averaged with
a single ``psum`` that XLA lowers onto the ICI torus; multi-host scaling goes
over DCN via ``jax.distributed.initialize``.  No hand-written communication —
the mesh + shardings ARE the comm layer.

The mesh is 1-D ("data") by default but is constructed through
``make_mesh(axes=...)`` so model axes can be added later without touching the
call sites (SURVEY.md §2.3: "design leaves mesh axis room").
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host (DCN) init.  No-op single-process (the common case here)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh; default 1-D {'data': n_devices}."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes)
    shape = tuple(axes.values())
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Shard a host batch along its leading (image) axis over the mesh."""
    n = mesh.shape[axis]

    def put(x):
        assert x.shape[0] % n == 0, (
            f"batch dim {x.shape[0]} not divisible by mesh axis {axis}={n}")
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    return jax.tree.map(put, batch)


def data_parallel_train_step(model, tx, arch, train_cfg, mesh: Mesh,
                             axis: str = "data", donate: bool = True):
    """Build the DP train step: per-chip forward/backward, psum-averaged grads.

    Signature matches ``make_train_step``'s product:
        step(state, batch, key) -> (state, metrics)
    where ``batch`` has a leading image axis divisible by the mesh size and
    ``state`` is replicated.  The whole step (including the grad ``psum``) is
    one jitted SPMD program; XLA schedules the reduce over ICI.
    """
    import optax

    from mnc_tpu.models.mnc import MNC  # noqa: F401  (typing xref)
    from mnc_tpu.train.loop import TrainState, mnc_loss

    anchors = jnp.asarray(arch.all_anchors())

    n_shards = mesh.shape[axis]

    def local_loss(params, batch, keys):
        totals, metrics = jax.vmap(
            lambda bt, k: mnc_loss(params, model, bt, k, arch, anchors, train_cfg)
        )(batch, keys)
        # scaled so the GLOBAL loss is the mean over the global batch: shard_map
        # autodiff inserts a psum on the cotangent of the replicated params
        # (transpose of broadcast), so grads of sum_shards(local_mean/n) are
        # exactly the global-mean gradient — no explicit grad collective.
        return jnp.mean(totals) / n_shards, jax.tree.map(jnp.mean, metrics)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P()), out_specs=(P(), P()),
    )
    def sharded_step(state, batch, key):
        # derive per-image keys by GLOBAL image index — split over the global
        # batch, then slice this shard's range — so 8-chip DP and single-
        # device vmap sample identical targets per image (exact grad-equality
        # with make_train_step is asserted in test_parallel.py)
        b = batch["image"].shape[0]
        all_keys = jax.random.split(key, b * n_shards)
        shard = jax.lax.axis_index(axis)
        keys = jax.lax.dynamic_slice_in_dim(all_keys, shard * b, b, axis=0)
        (_, metrics), grads = jax.value_and_grad(local_loss, has_aux=True)(
            state.params, batch, keys)
        # grads are already globally reduced (see local_loss); only the
        # device-varying metrics need an explicit mean.
        metrics = jax.lax.pmean(metrics, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())


def data_parallel_eval_step(pipeline_run, mesh: Mesh, axis: str = "data"):
    """Shard batched inference over the mesh: (params, images, im_infos) →
    per-image detection dicts, images split along the leading axis."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)), out_specs=P(axis),
    )
    def sharded(params, images, infos):
        return jax.vmap(pipeline_run, in_axes=(None, 0, 0))(params, images, infos)

    return jax.jit(sharded)
