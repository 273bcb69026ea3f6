"""End-to-end inference pipeline (the ``im_detect`` equivalent)."""

from mnc_tpu.pipeline.inference import MNCPipeline, postprocess_detections  # noqa: F401
