"""Persistent XLA compilation cache.

The tiled-NMS programs compile in minutes at reference working sets
(6000/12000 pre-NMS), and ``MNCPipeline`` compiles one program variant per
canvas bucket / orientation — a realistic ``TEST.CANVAS_BUCKETS`` set pays
that 4-6× *per process*.  JAX's persistent compilation cache keys compiled
executables by (HLO, compile options, platform) on disk, so every variant
compiles once per machine instead of once per process.

≙ nothing in the reference (Caffe built its net once per process and had no
multi-minute compiles); this is a TPU/XLA-specific operational concern.

Enabled by every CLI tool via ``tools/_init_paths.py``.  Opt out with
``MNC_XLA_CACHE_DIR=off``; point elsewhere with ``MNC_XLA_CACHE_DIR=/path``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                            "output", "xla_cache")


def enable_compilation_cache(cache_dir: str | None = None,
                             force: bool = False) -> str | None:
    """Turn on JAX's on-disk compilation cache; returns the dir (or None).

    Safe to call before or after backend init (config flags only — does not
    create a device client).  Compiles faster than ~2 s are not cached (the
    disk round-trip wouldn't pay).

    CPU runs are excluded unless ``force``: XLA:CPU caches AOT machine code
    keyed loosely enough that entries replay across differing host-feature
    sets (observed in this VM: 'prefer-no-scatter … not supported on the
    host machine … could lead to SIGILL').  The multi-minute compiles this
    cache exists for (tiled NMS, canvas variants) are TPU-side anyway.
    """
    import sys

    if not force and ("--cpu" in sys.argv or "--smoke" in sys.argv
                      or os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"):
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("MNC_XLA_CACHE_DIR") or _DEFAULT_DIR
    if cache_dir.lower() in ("off", "none", "0", ""):
        return None
    import jax

    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir
