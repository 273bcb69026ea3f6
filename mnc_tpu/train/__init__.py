"""Training: on-device target assignment, multi-task cascade loss, solver."""

from mnc_tpu.train.targets import (  # noqa: F401
    AnchorTargets,
    RoiTargets,
    anchor_targets,
    proposal_targets,
    reassign_targets,
)
from mnc_tpu.train.loop import TrainState, make_train_step, mnc_loss  # noqa: F401
from mnc_tpu.train.optim import make_optimizer, step_lr  # noqa: F401
