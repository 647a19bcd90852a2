from fenet.utils.average_meter import AverageMeter, ProgressMeter, accuracy
from fenet.utils.logger import get_logger
from fenet.utils.ply import export_pointcloud, load_pointcloud

__all__ = [
    "AverageMeter",
    "ProgressMeter",
    "accuracy",
    "export_pointcloud",
    "get_logger",
    "load_pointcloud",
]
