"""Persistent XLA compilation cache wiring (VERDICT r2 weak #3)."""

import os

import jax
import jax.numpy as jnp

from mnc_tpu.utils.compile_cache import enable_compilation_cache


def test_enable_sets_flags_and_writes_entries(tmp_path):
    d = enable_compilation_cache(str(tmp_path / "xla"), force=True)
    assert d == str(tmp_path / "xla") and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # drop the min-compile-time floor so a trivial program gets cached
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.jit(lambda x: x * 3 + 1)(jnp.arange(7.0)).block_until_ready()
        assert os.listdir(d), "no cache entry written"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def test_opt_out():
    assert enable_compilation_cache("off", force=True) is None
    assert enable_compilation_cache("none", force=True) is None


def test_cpu_guard(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert enable_compilation_cache("/tmp/should_not_be_used") is None
