"""Path shim — ≙ reference ``tools/_init_paths.py`` (adds the repo root)."""

import os.path as osp
import sys

_root = osp.abspath(osp.join(osp.dirname(__file__), ".."))
if _root not in sys.path:
    sys.path.insert(0, _root)
