"""Iterative Closest Point, jitted and batched on device.

Rebuild of utils/icp.py:4-118. The reference runs ICP per sample on the host
(sklearn NearestNeighbors per iteration, testnet.py:62-64) — the eval-path
bottleneck. Here correspondence is a brute-force argmin over an MXU pairwise
distance matrix, the best-fit transform is a closed-form 3x3 SVD, and the
whole solver is a ``lax.while_loop`` vmapped over the batch, so the
per-sample device->host->device round-trip disappears.

Semantics kept from the reference:
- ``icp(A, B)`` returns T mapping A onto B (plus final NN distances);
- convergence when |prev_error - mean_error| < tolerance, with error the mean
  *euclidean* NN distance (icp.py:100-114);
- the final T is re-fit from the original A to the converged source
  (icp.py:117);
- reflection fix by flipping the last row of Vt when det(R) < 0 (icp.py:33-36).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from fenet.ops.pairwise import pairwise_sqdist


def best_fit_transform(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Least-squares rigid transform mapping corresponding points a -> b.

    a, b: (N, 3). Returns the 4x4 homogeneous T (icp.py:4-46).
    """
    ca = jnp.mean(a, axis=0)
    cb = jnp.mean(b, axis=0)
    aa = a - ca
    bb = b - cb
    h = aa.T @ bb
    u, _, vt = jnp.linalg.svd(h)
    r = vt.T @ u.T
    # Reflection fix: recompute with the last row of Vt negated.
    vt_fixed = vt.at[-1, :].multiply(-1.0)
    r = jnp.where(jnp.linalg.det(r) < 0, vt_fixed.T @ u.T, r)
    t = cb - r @ ca
    top = jnp.concatenate([r, t[:, None]], axis=1)  # (3, 4)
    return jnp.concatenate(
        [top, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0
    )


def _nn(src: jnp.ndarray, dst: jnp.ndarray):
    d = pairwise_sqdist(src[None], dst[None])[0]
    idx = jnp.argmin(d, axis=1)
    return jnp.sqrt(jnp.min(d, axis=1)), idx


@functools.partial(jax.jit, static_argnames=("max_iterations",))
def icp(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_iterations: int = 20,
    tolerance: float = 0.001,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-pair ICP; a, b: (N, 3). Returns (T 4x4, distances (N,), iters)."""

    def cond(state):
        src, prev_err, it, done = state
        return jnp.logical_and(it < max_iterations, jnp.logical_not(done))

    def body(state):
        src, prev_err, it, _ = state
        dist, idx = _nn(src, b)
        t = best_fit_transform(src, b[idx])
        src = src @ t[:3, :3].T + t[:3, 3]
        err = jnp.mean(dist)
        done = jnp.abs(prev_err - err) < tolerance
        return src, err, it + 1, done

    src0 = a
    src, _, iters, _ = jax.lax.while_loop(
        cond, body, (src0, jnp.float32(0.0), jnp.int32(0), jnp.bool_(False))
    )
    t_final = best_fit_transform(a, src)
    dist, _ = _nn(src, b)
    return t_final, dist, iters


@functools.partial(jax.jit, static_argnames=("max_iterations",))
def batched_icp(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_iterations: int = 1024,
    tolerance: float = 1e-10,
) -> jnp.ndarray:
    """vmapped ICP over (B, N, 3) pairs; returns (B, 4, 4) transforms.

    Defaults are the eval driver's settings (testnet.py:63).
    """
    fn = functools.partial(
        icp, max_iterations=max_iterations, tolerance=tolerance
    )
    t, _, _ = jax.vmap(lambda x, y: fn(x, y))(a, b)
    return t


def align_pred_to_gt(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    max_iterations: int = 1024,
    tolerance: float = 1e-10,
) -> jnp.ndarray:
    """The eval drivers' alignment step (testnet.py:62-66): fit T = icp(gt,
    pred), then apply ``pred @ R - t`` to pull the prediction onto the GT."""
    t = batched_icp(gt, pred, max_iterations=max_iterations,
                    tolerance=tolerance)
    r = t[:, :3, :3]
    tr = t[:, :3, 3]
    return jnp.einsum("bnj,bjk->bnk", pred, r) - tr[:, None, :]
