"""Test bootstrap: force an 8-device CPU mesh BEFORE jax is imported.

This is the TPU answer to "test multi-chip without a cluster" (SURVEY.md §4):
all sharding / shard_map tests run against 8 virtual CPU devices; numeric
tests run on CPU in float32.
"""

import os

# The session's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (real TPU), so env edits here are too late for jax's
# import-time latch — use jax.config before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"


@pytest.fixture
def rng():
    return np.random.RandomState(3)


def random_boxes(rs, n, h=200.0, w=300.0, min_size=2.0):
    """Random well-formed (x1, y1, x2, y2) boxes inside (h, w)."""
    x1 = rs.uniform(0, w - min_size - 1, size=n)
    y1 = rs.uniform(0, h - min_size - 1, size=n)
    bw = rs.uniform(min_size, w / 2, size=n)
    bh = rs.uniform(min_size, h / 2, size=n)
    x2 = np.minimum(x1 + bw, w - 1)
    y2 = np.minimum(y1 + bh, h - 1)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)
