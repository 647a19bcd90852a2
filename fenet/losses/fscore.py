"""F-score between point clouds (loss/loss_.py:122-140)."""

from __future__ import annotations

import jax.numpy as jnp

from fenet.ops.chamfer import chamfer_distance


def fscore(x: jnp.ndarray, y: jnp.ndarray, threshold: float = 1e-4):
    """F-score at a squared-distance threshold (default 1e-4, loss_.py:122).

    Returns (fscore, precision_1, precision_2), all scalars; NaN batches
    (no point within threshold on either side) count as 0 like the
    reference's fscore[isnan]=0.
    """
    dist1, dist2, _, _ = chamfer_distance(x, y)
    p1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=1)
    p2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=1)
    f = 2 * p1 * p2 / (p1 + p2)
    f = jnp.where(jnp.isnan(f), 0.0, f)
    return jnp.mean(f), jnp.mean(p1), jnp.mean(p2)
