"""Silhouette projection losses (loss/proj_loss.py:6-54).

Documented fixes (SURVEY.md §2 P5):

- the reference's ``bce``/``weighted_bce`` variants pass (gt, pred) to
  torch's BCE losses in (input, target) order — i.e. the prediction is used
  as the target (proj_loss.py:10-16). Here all variants use the conventional
  (pred=input, gt=target) order; the finetune driver's ``bce_prob`` variant
  already had the correct order and is bit-matching.
- the reference broadcasts *both* silhouette masks over the first grid-index
  pair (proj_loss.py:25-37), which collapses its min-distance terms to
  ``gt * mask(pred)`` at the same cell (the +1'd distance min is identically
  1). Here the source mask is indexed at the far cell (h', w'), the affinity
  the CAPNet-style loss intends. These terms are log-only in the finetune
  driver (finetune.py:152-158), so training parity is unaffected.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def grid_dist(grid_h: int, grid_w: int) -> np.ndarray:
    """All-pairs euclidean distances between grid cells, reshaped to
    (H, W, H, W) (proj_loss.py:46-54)."""
    x, y = np.meshgrid(range(grid_h), range(grid_w), indexing="ij")
    grid = np.stack([x.ravel(), y.ravel()], axis=1).astype(np.float32)
    d = np.sqrt(
        ((grid[:, None, :] - grid[None, :, :]) ** 2).sum(-1)
    )
    return d.reshape(grid_h, grid_w, grid_h, grid_w)


def _bce(pred, gt, eps=1e-7):
    pred = jnp.clip(pred, eps, 1 - eps)
    return -(gt * jnp.log(pred) + (1 - gt) * jnp.log(1 - pred))


def _bce_logits(pred, gt):
    return jnp.maximum(pred, 0) - pred * gt + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def get_loss_proj(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    loss_type: str = "bce",
    w: float = 1.0,
    min_dist_loss: bool = False,
    dist_mat: Optional[jnp.ndarray] = None,
    grid_h: int = 64,
    grid_w: int = 64,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Projection loss between (B, H, W) silhouettes.

    Returns (mean loss, min_dist, min_dist_inv); the latter two are the
    affinity terms (None unless ``min_dist_loss``), each (B, H, W) — the
    forward/backward grid-distance penalties the finetune driver logs as
    fwd/bwd (finetune.py:152-158).
    """
    if loss_type == "bce":
        loss = _bce(pred, gt)
    elif loss_type == "weighted_bce":
        loss = _bce_logits(pred, gt)
    elif loss_type == "bce_prob":
        # The gaussian-splat silhouette is a SUM of kernels, not a
        # probability: cells under overlapping points exceed 1, so
        # |1 - pred - eps| crosses 0 and the log's gradient is unbounded
        # at pred = 1 - eps. Harmless in the reference, which detaches the
        # projection (utils/utils.py:199,209 — no gradient ever flows);
        # fatal here, where the finetune step differentiates through it
        # (one step from a saturated silhouette emitted inf grads -> NaN
        # params, measured on chip round 5). Flooring the log argument
        # changes the value only inside the measure-zero band where the
        # reference's own value is ±inf, and zeroes the gradient there.
        epsilon = 1e-8
        floor = 1e-7
        loss = -gt * jnp.log(pred + epsilon) * w - (1 - gt) * jnp.log(
            jnp.maximum(jnp.abs(1 - pred - epsilon), floor)
        )
    else:
        raise ValueError(f"unknown loss_type {loss_type!r}")

    min_dist = min_dist_inv = None
    if min_dist_loss:
        if dist_mat is None:
            dist_mat = jnp.asarray(grid_dist(grid_h, grid_w))
        dmat = dist_mat + 1.0  # proj_loss.py:22
        # gt_white/pred_white: (B, H, W) broadcast against the (H, W, H', W')
        # grid-distance tensor; masks push non-silhouette cells to ~1e6.
        gt_w = gt[:, :, :, None, None]
        pred_w = pred[:, :, :, None, None]
        pred_src = pred[:, None, None, :, :]  # value at the far cell (h', w')
        gt_src = gt[:, None, None, :, :]
        pred_mask_src = pred_src + (1.0 - pred_src) * 1e6
        gt_mask = gt_w + (1.0 - gt_w) * 1e6
        dist_masked_inv = gt_w * dmat[None] * pred_mask_src
        dist_masked = gt_mask * dmat[None] * pred_src
        min_dist = jnp.min(dist_masked, axis=(3, 4))
        min_dist_inv = jnp.min(dist_masked_inv, axis=(3, 4))
    return jnp.mean(loss), min_dist, min_dist_inv
