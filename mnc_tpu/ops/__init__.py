"""Geometry, kernels and losses — the foundation layer (SURVEY.md §7 step 1).

Everything here is a pure fixed-shape JAX function usable under jit; the
dynamic-shape algorithms of the reference's Python layers (NMS, sampling,
target assignment) are expressed as masked computation over padded arrays.
"""

from mnc_tpu.ops.anchors import generate_anchors, shifted_anchors  # noqa: F401
from mnc_tpu.ops.bbox import (  # noqa: F401
    bbox_overlaps,
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
)
from mnc_tpu.ops.nms import nms_fixed, nms_indices, nms_tiled  # noqa: F401
from mnc_tpu.ops.losses import (  # noqa: F401
    sigmoid_cross_entropy,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from mnc_tpu.ops.roi_warp import roi_warp, roi_pool  # noqa: F401
from mnc_tpu.ops.mask_pooling import mask_pooling  # noqa: F401
from mnc_tpu.ops.masks import (  # noqa: F401
    intersect_mask,
    mask_overlap,
    paste_masks,
    resize_masks,
)
from mnc_tpu.ops.mask_voting import mask_voting  # noqa: F401
