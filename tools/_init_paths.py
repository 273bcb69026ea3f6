"""Path shim — ≙ reference ``tools/_init_paths.py`` (adds the repo root).

Also enables the persistent XLA compilation cache for every CLI tool (the
multi-minute tiled-NMS / canvas-variant compiles amortize across processes;
``MNC_XLA_CACHE_DIR=off`` opts out)."""

import os.path as osp
import sys

_root = osp.abspath(osp.join(osp.dirname(__file__), ".."))
if _root not in sys.path:
    sys.path.insert(0, _root)

from mnc_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
