"""Blender camera math (utils/cam_read.py, minus its import-time side effects).

The reference module runs ``gen_obj_img_h5()`` at import (cam_read.py:314);
here everything is a pure function. The per-view metadata table ``PARAMS``
(cam_read.py:11-48) is kept for reprojection demos/tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

ROT90Y = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float32)

# Blender constants (cam_read.py:53-60).
F_MM = 35.0
SENSOR_SIZE_MM = 32.0
CAM_MAX_DIST = 1.75
CAM_ROT = np.array(
    [
        [1.910685676922942e-15, 4.371138828673793e-08, 1.0],
        [1.0, -4.371138828673793e-08, -0.0],
        [4.371138828673793e-08, 1.0, -4.371138828673793e-08],
    ]
)


def get_blender_proj(
    az: float, el: float, distance_ratio: float,
    img_w: int = 224, img_h: int = 224,
) -> Tuple[np.ndarray, np.ndarray]:
    """K (3x3) and RT (3x4) from azimuth/elevation/distance (cam_read.py:51-100)."""
    f_u = F_MM * img_w / SENSOR_SIZE_MM
    f_v = F_MM * img_h / SENSOR_SIZE_MM
    k = np.array([[f_u, 0.0, img_w / 2.0],
                  [0.0, f_v, img_h / 2.0],
                  [0.0, 0.0, 1.0]])

    sa, ca = np.sin(np.radians(-az)), np.cos(np.radians(-az))
    se, ce = np.sin(np.radians(-el)), np.cos(np.radians(-el))
    r_world2obj = np.array(
        [[ca * ce, -sa, ca * se], [sa * ce, ca, sa * se], [-se, 0, ce]]
    ).T
    r_obj2cam = CAM_ROT.T
    r_world2cam = r_obj2cam @ r_world2obj
    cam_location = np.array([distance_ratio * CAM_MAX_DIST, 0, 0])
    t_world2cam = -1 * r_obj2cam @ cam_location
    r_camfix = np.diag([1.0, -1.0, -1.0])
    r_world2cam = r_camfix @ r_world2cam
    t_world2cam = r_camfix @ t_world2cam
    return k, np.hstack([r_world2cam, t_world2cam[:, None]])


def get_rotate_matrix(angle: float) -> np.ndarray:
    """4x4 x-rotation (cam_read.py:103-110)."""
    c, s = np.cos(angle), np.sin(angle)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]],
        np.float64,
    )


def get_img_points(pcl: np.ndarray, k: np.ndarray, rt: np.ndarray,
                   img_hw: Tuple[int, int] = (224, 224)) -> np.ndarray:
    """Reproject a world-space cloud to integer pixel coordinates
    (the cam_read.py get_img_points demo)."""
    homo = np.concatenate([pcl, np.ones((len(pcl), 1))], axis=1)
    cam = (rt @ homo.T)
    uvw = k @ cam
    uv = (uvw[:2] / uvw[2:]).T
    return np.clip(np.round(uv).astype(np.int64),
                   0, max(img_hw) - 1)


def transform_points(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    """Apply (B, 3, 4) RT or (B, 3, 3) K to (B, N, 3) points (common.py:21-40)."""
    if transform.shape[2] == 4:
        r, t = transform[:, :, :3], transform[:, :, 3:]
        return points @ r.transpose(0, 2, 1) + t.transpose(0, 2, 1)
    return points @ transform.transpose(0, 2, 1)


def normalize_imagenet(x: np.ndarray) -> np.ndarray:
    """ImageNet normalization for (B, H, W, 3) 0..1 images (common.py:8-18)."""
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (x - mean) / std
