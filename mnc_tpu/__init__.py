"""mnc_tpu — a TPU-native rebuild of Multi-task Network Cascades (MNC).

Re-implements the capabilities of the reference ``daijifeng001/MNC`` repository
(instance-aware semantic segmentation via a multi-task network cascade, CVPR 2016)
as an idiomatic JAX/XLA/Pallas framework:

- The Caffe graph (reference ``caffe-mnc/src/caffe/net.cpp``) becomes jitted pure
  functions over fixed-shape arrays — one XLA program per pipeline.
- The novel CUDA layers (``roi_warping_layer.cu``, ``mask_pooling_layer.cu``,
  ``roi_pooling_layer.cu``) become Pallas kernels / fused XLA einsum formulations
  with custom VJPs (gradients w.r.t. features AND box coordinates).
- The dynamic-shape Python layers (``lib/pylayer/*``: proposal decoding, NMS,
  anchor/proposal target sampling, stage bridging) become fixed-shape masked
  computations that run on-device inside the same jit — no host round-trips.
- Multi-device scaling uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives over ICI, replacing Caffe's ``P2PSync`` (``parallel.cpp``).

Layout (mirrors SURVEY.md §7):
    mnc_tpu.config    — typed config tree, reference key names, YAML merge
    mnc_tpu.ops       — geometry + kernels (anchors, bbox, nms, roi_warp, masks, losses)
    mnc_tpu.models    — VGG-16 / ResNet trunks, RPN & cascade heads, MNC assembly
    mnc_tpu.train     — on-device target assignment, multi-task loss, train step
    mnc_tpu.parallel  — device mesh, data-parallel shard_map train/eval steps
    mnc_tpu.data      — VOC/SBD datasets, maskdb, synthetic data, mAP^r evaluator
    mnc_tpu.utils     — image prep, checkpointing, timers, visualization
    mnc_tpu.native    — C++ host-side helpers (nms/mask oracles, RLE) via ctypes
"""

__version__ = "0.1.0"

from mnc_tpu.config import cfg, cfg_from_file, get_output_dir  # noqa: F401
