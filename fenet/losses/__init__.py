"""Loss facade + projection/F-score losses."""

from fenet.losses.facade import (
    Loss,
    chamfer_loss,
    emd_loss,
    point_loss,
    point_loss_test,
    scheduled_total_loss,
)
from fenet.losses.fscore import fscore
from fenet.losses.projection import get_loss_proj, grid_dist
from fenet.losses.sinkhorn import batch_emd_loss, sinkhorn_distance

__all__ = [
    "Loss",
    "batch_emd_loss",
    "chamfer_loss",
    "emd_loss",
    "fscore",
    "get_loss_proj",
    "grid_dist",
    "point_loss",
    "point_loss_test",
    "scheduled_total_loss",
    "sinkhorn_distance",
]
