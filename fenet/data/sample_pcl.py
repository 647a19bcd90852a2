"""Offline GT prep: produce pointcloud_128/256.npy per model via FPS.

Rebuild of the side-effecting dataset in utils/datasets_sample_pcl.py:50-96:
for each model, sort the 1024-point GT cloud by squared distance to a random
viewpoint from a fixed 5-viewpoint set, then farthest-point-sample 128 points
(seed index 1, RAN=False) and 256 points (seed index 0, RAN=True), and save
next to the source cloud. Batched on device instead of per-point Python loops.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from fenet.ops.fps import farthest_point_sample, index_points

# The reference's viewpoint set (datasets_sample_pcl.py:70-71).
VIEWPOINTS = np.array(
    [[1, 0, 0], [0, 0, 1], [1, 0, 1], [-1, 0, 0], [-1, 1, 0]], np.float32
)


def sample_model_cloud(pcl: np.ndarray, rng: random.Random):
    """(N, 3) cloud -> (cloud_128, cloud_256) per the reference recipe."""
    viewpoint = VIEWPOINTS[rng.randrange(len(VIEWPOINTS))]
    order = np.argsort(((pcl - viewpoint) ** 2).sum(-1), kind="stable")
    centered = jnp.asarray(pcl[order])[None]  # (1, N, 3)
    idx128 = farthest_point_sample(centered, 128, ran=False)
    idx256 = farthest_point_sample(centered, 256, ran=True)
    c128 = np.asarray(index_points(centered, idx128))[0]
    c256 = np.asarray(index_points(centered, idx256))[0]
    return c128, c256


def prepare_splits(
    data_dir_pcl: str,
    models: Dict[str, Sequence[str]],
    cats: Sequence[str],
    num_points: int = 1024,
    seed: int = 0,
    overwrite: bool = False,
) -> int:
    """Generate missing pointcloud_128/256.npy files; returns #models written."""
    rng = random.Random(seed)
    written = 0
    for cat in cats:
        for model in models[cat]:
            mdir = os.path.join(data_dir_pcl, model)
            p128 = os.path.join(mdir, "pointcloud_128.npy")
            p256 = os.path.join(mdir, "pointcloud_256.npy")
            if not overwrite and os.path.exists(p128) and os.path.exists(p256):
                continue
            pcl = np.load(
                os.path.join(mdir, f"pointcloud_{num_points}.npy")
            ).astype(np.float32)
            c128, c256 = sample_model_cloud(pcl, rng)
            np.save(p128, c128)
            np.save(p256, c256)
            written += 1
    return written
