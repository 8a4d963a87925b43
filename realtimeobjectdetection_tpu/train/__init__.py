from .targets import build_targets  # noqa: F401
from .loss import yolo_loss  # noqa: F401
