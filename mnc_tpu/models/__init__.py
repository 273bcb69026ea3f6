"""Model trunks, heads, and the MNC cascade assembly."""

from mnc_tpu.models.vgg import VGG16Trunk  # noqa: F401
from mnc_tpu.models.resnet import ResNetTrunk  # noqa: F401
from mnc_tpu.models.heads import ClassifyHead, MaskHead, RPNHead  # noqa: F401
from mnc_tpu.models.mnc import MNC, propose_rois, stage_bridge  # noqa: F401
