"""Point-cloud normalization / alignment utilities.

jnp equivalents of utils/utils.py:66-178 and utils/datasets_old.py:126-144,
written as pure functions (the reference mutates tensors in place).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def rotate(
    xyz: np.ndarray, xangle: float = 0, yangle: float = 0, zangle: float = 0
) -> np.ndarray:
    """Compose x/y/z rotations and apply on the right (datasets_old.py:126-144).

    Note the reference's y-rotation uses the transposed sign convention
    (-sin in the [0,2] slot); kept verbatim for data parity.
    """
    rx = np.array(
        [
            [1, 0, 0],
            [0, np.cos(xangle), -np.sin(xangle)],
            [0, np.sin(xangle), np.cos(xangle)],
        ]
    )
    ry = np.array(
        [
            [np.cos(yangle), 0, -np.sin(yangle)],
            [0, 1, 0],
            [np.sin(yangle), 0, np.cos(yangle)],
        ]
    )
    rz = np.array(
        [
            [np.cos(zangle), -np.sin(zangle), 0],
            [np.sin(zangle), np.cos(zangle), 0],
            [0, 0, 1],
        ]
    )
    return xyz.dot(rx.dot(ry).dot(rz))


def preprocess_pcl_gt(pcl: jnp.ndarray) -> jnp.ndarray:
    """Axis swap/flip aligning GT clouds to the renderer frame
    (utils/utils.py:66-78): swap x<->z, then x<->y, negate new x and y."""
    x, y, z = pcl[..., 0], pcl[..., 1], pcl[..., 2]
    # After [0,2] swap: (z, y, x); after [0,1] swap: (y, z, x); negate 0 and 1.
    return jnp.stack([-y, -z, x], axis=-1)


def average_pcl(p: jnp.ndarray):
    """Center a batch of clouds by the *batch-global* per-axis mean
    (utils/utils.py:80-87 uses torch.mean over batch and points)."""
    mean = jnp.mean(p, axis=(0, 1))  # (3,)
    return p - mean, mean[0], mean[1], mean[2]


def outlier(p: jnp.ndarray, x_mean, y_mean, z_mean) -> jnp.ndarray:
    """Clamp the single most-extreme point per axis to the pre-centering mean.

    The reference implementation (utils/utils.py:89-140) is a tangle of
    aliased in-place loops; its *net effect* — every conditional assignment
    aliases the same storage, and the "min" loops reuse the max indices — is
    exactly: for each batch element and axis a, set p[argmax_a, a] = mean_a.
    This is that effect, vectorized (documented divergence: the dead branches
    of the reference are not replicated).
    """
    means = jnp.stack(
        [jnp.asarray(x_mean), jnp.asarray(y_mean), jnp.asarray(z_mean)]
    )
    idx = jnp.argmax(p, axis=1)  # (B, 3) argmax point per axis
    bidx = jnp.arange(p.shape[0])[:, None]
    aidx = jnp.arange(3)[None, :]
    return p.at[bidx, idx, aidx].set(means[None, :])


def scale2one(p: jnp.ndarray) -> jnp.ndarray:
    """Per-axis scale by 2/extent — without re-centering (utils/utils.py:143-178
    leaves the centering lines commented out; kept faithfully)."""
    delta = jnp.max(p, axis=1, keepdims=True) - jnp.min(p, axis=1, keepdims=True)
    return 2.0 * p / jnp.abs(delta)


def normalize_to_unit_cube(p: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shift+scale a batch of clouds into [0, 1]^3 (the EMD kernel's expected
    input range, metric/emd/README.md:19). Returns (scaled, mins, scale)."""
    mins = jnp.min(p, axis=1, keepdims=True)
    maxs = jnp.max(p, axis=1, keepdims=True)
    scale = jnp.maximum(jnp.max(maxs - mins, axis=2, keepdims=True), 1e-8)
    return (p - mins) / scale, mins, scale
