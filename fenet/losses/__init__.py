"""Loss facade + projection/F-score losses."""

from fenet.losses.facade import (
    Loss,
    chamfer_loss,
    emd_loss,
    scheduled_total_loss,
)
from fenet.losses.fscore import fscore
from fenet.losses.projection import get_loss_proj, grid_dist

__all__ = [
    "Loss",
    "chamfer_loss",
    "emd_loss",
    "fscore",
    "get_loss_proj",
    "grid_dist",
    "scheduled_total_loss",
]
