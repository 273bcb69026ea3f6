"""Subprocess worker for the multi-host (DCN-path) smoke test.

Each process forces the CPU backend (the only way in this sandbox — the env
var is latched to the TPU platform at interpreter startup), joins the
coordination service via ``init_distributed``, builds the GLOBAL mesh over
both processes' devices, and runs a cross-process ``psum``.  Run by
``test_parallel.py::test_init_distributed_two_process_psum``.
"""

import functools
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mnc_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402


def main(coordinator: str, pid: int, nproc: int) -> None:
    init_distributed(coordinator, nproc, pid)
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.process_count() == nproc, jax.process_count()

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()  # global: all processes' devices
    n_global = len(jax.devices())

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P(), out_specs=P())
    def allreduce(a):
        return jax.lax.psum(a, "data")

    y = jax.device_get(jax.jit(allreduce)(jnp.ones(4)))
    assert float(y[0]) == float(n_global), (y, n_global)
    print(f"DIST_OK proc={pid} nproc={jax.process_count()} ndev={n_global}",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
