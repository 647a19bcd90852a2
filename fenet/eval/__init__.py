"""Evaluation: metric registry + batched ShapeNet/Pix3D eval loops."""

from fenet.eval.metrics import Metrics, eval_metrics

__all__ = ["Metrics", "eval_metrics"]
