from fenet.utils.average_meter import AverageMeter
from fenet.utils.logger import get_logger

__all__ = ["AverageMeter", "get_logger"]
