"""Datasets, maskdb, evaluation, and loaders."""

from mnc_tpu.data.synthetic import SyntheticShapes  # noqa: F401
