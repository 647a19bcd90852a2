"""Differentiable geometry: projection, camera math, ICP, cloud utilities."""

from fenet.geometry.icp import batched_icp, best_fit_transform, icp
from fenet.geometry.pointcloud import (
    average_pcl,
    outlier,
    preprocess_pcl_gt,
    rotate,
    scale2one,
)
from fenet.geometry.projection import (
    apply_kernel,
    cont_proj,
    disc_proj,
    perspective_transform,
    project_silhouettes,
    world2cam,
)

__all__ = [
    "apply_kernel",
    "average_pcl",
    "batched_icp",
    "best_fit_transform",
    "cont_proj",
    "disc_proj",
    "icp",
    "outlier",
    "perspective_transform",
    "preprocess_pcl_gt",
    "project_silhouettes",
    "rotate",
    "scale2one",
    "world2cam",
]
