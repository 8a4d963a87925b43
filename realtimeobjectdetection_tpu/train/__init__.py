from .targets import build_targets  # noqa: F401
from .loss import yolo_loss  # noqa: F401
from .v5 import TrainerV5, build_targets_v5, yolo_loss_v5  # noqa: F401
