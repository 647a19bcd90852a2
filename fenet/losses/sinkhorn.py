"""Sinkhorn-divergence EMD alternate (loss/loss_.py:111-120's geomloss
``SamplesLoss('gaussian', blur=5e-5)`` path), as pure jnp.

Entropic-regularized OT between uniform point-cloud measures with log-domain
Sinkhorn iterations — a batched, MXU-friendly alternative to the auction EMD
for training (fully differentiable through the iterations, fixed cost).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fenet.ops.pairwise import pairwise_sqdist


@functools.partial(jax.jit, static_argnames=("iters",))
def sinkhorn_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    blur: float = 0.01,
    iters: int = 50,
) -> jnp.ndarray:
    """Batched entropic OT cost OT_eps(x, y); x, y: (B, N, 3), (B, M, 3).

    Returns (B,) transport costs under squared-euclidean ground cost with
    eps = blur**2 (geomloss's p=2 convention).
    """
    b, n, _ = x.shape
    m = y.shape[1]
    eps = blur * blur
    c = pairwise_sqdist(x, y)  # (B, N, M)
    log_mu = jnp.full((b, n), -jnp.log(n))
    log_nu = jnp.full((b, m), -jnp.log(m))

    def body(_, fg):
        f, g = fg
        # log-domain updates: f_i = -eps * LSE_j[(g_j - C_ij)/eps + log nu_j]
        f = -eps * jax.scipy.special.logsumexp(
            (g[:, None, :] - c) / eps + log_nu[:, None, :], axis=2
        )
        g = -eps * jax.scipy.special.logsumexp(
            (f[:, :, None] - c) / eps + log_mu[:, :, None], axis=1
        )
        return f, g

    f, g = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((b, n)), jnp.zeros((b, m)))
    )
    pi_log = (f[:, :, None] + g[:, None, :] - c) / eps + (
        log_mu[:, :, None] + log_nu[:, None, :]
    )
    return jnp.sum(jnp.exp(pi_log) * c, axis=(1, 2))


def batch_emd_loss(x: jnp.ndarray, y: jnp.ndarray, blur: float = 0.01,
                   iters: int = 50) -> jnp.ndarray:
    """Mean Sinkhorn cost over the batch (batch_EMD_loss, loss_.py:111-120)."""
    return jnp.mean(sinkhorn_distance(x, y, blur, iters))


def sinkhorn_emd_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                      blur: float = 0.01, iters: int = 300,
                      eps0: float = 0.25) -> jnp.ndarray:
    """Auction-compatible training EMD via entropic OT — the
    ``--emd_impl sinkhorn`` path.

    Same loss semantics as :func:`fenet.losses.facade.emd_loss` (mean over
    points of sqrt matched squared distance, loss.py:18-28) with the
    auction's hard assignment replaced by the Sinkhorn plan: per-point cost
    ``cost_i = N * sum_j pi_ij * C_ij`` (rows of pi sum to 1/N), reducing to
    the matched distance as the plan sharpens. Epsilon ANNEALS geometrically
    from ``eps0`` down to ``blur**2`` over the first 2/3 of the budget —
    plain fixed-eps Sinkhorn stalls at small eps (contraction rate dies as
    exp(-diameter/eps)); annealed, the plan reaches permutation sharpness
    and the LAP-optimal cost in a few hundred iterations (measured: equals
    scipy LAP to 4 decimals at N=64, blur 0.005-0.02).

    Gradient: the SAME detached-plan rule as the auction backward
    (emd.py — grad treats the assignment as constant): the Sinkhorn
    iterations run under ``stop_gradient``, gradients flow only through the
    live cost matrix, so the backward is one weighted pairwise-difference
    contraction — no (B, N, M) residual per iteration, no backprop through
    the loop.
    """
    b, n, _ = pred.shape
    m = gt.shape[1]
    eps = blur * blur
    # Anneal START must not sit below the target: with blur**2 >= eps0 the
    # geometric schedule's ratio q would exceed 1 and eps would GROW past
    # the target for the last third of the budget, leaving the potentials
    # converged at a larger eps than the one the plan below is exponentiated
    # with (mis-normalized pi, silently wrong loss). Degenerates to fixed-eps
    # Sinkhorn when eps == eps0.
    eps0 = max(eps0, eps)
    c = pairwise_sqdist(pred, gt)  # live: the only gradient path
    c0 = jax.lax.stop_gradient(c)
    f, g = _potentials(
        jax.lax.stop_gradient(pred), jax.lax.stop_gradient(gt), c0,
        eps, iters, eps0,
    )
    pi = jnp.exp(
        (f[:, :, None] + g[:, None, :] - c0) / eps
        - jnp.log(n) - jnp.log(m)
    )  # detached plan: built from detached potentials + c0 only
    per_point = n * jnp.sum(pi * c, axis=2)  # (B, N)
    return jnp.sqrt(jnp.maximum(per_point, 0.0)).mean(axis=1).mean()


def _potentials(pred, gt, c0, eps, iters, eps0):
    """Annealed Sinkhorn potentials (f, g), all-detached inputs.

    On TPU at kernel-eligible shapes this runs the VMEM-resident Pallas
    kernel (ops/sinkhorn.py) — the XLA loop below re-reads the (B, N, M)
    cost matrix from HBM twice per iteration (~1 GB/iter at the training
    shape), which the kernel reduces to zero per-iteration HBM traffic."""
    b, n, _ = pred.shape
    m = gt.shape[1]
    from fenet.ops.sinkhorn import (
        MAX_N_IN_VMEM,
        MAX_N_STREAMING,
        sinkhorn_potentials,
        sinkhorn_potentials_stream,
    )

    if jax.default_backend() == "tpu":
        if (
            n <= MAX_N_IN_VMEM and m <= MAX_N_IN_VMEM
            and n % 128 == 0 and m % 128 == 0  # lane/sublane tiling
        ):
            return sinkhorn_potentials(pred, gt, eps, iters, eps0)
        if (
            n <= MAX_N_STREAMING and m <= MAX_N_STREAMING
            and n % 256 == 0 and m % 128 == 0  # row chunks of 256
        ):
            return sinkhorn_potentials_stream(pred, gt, eps, iters, eps0)

    log_mu = jnp.full((b, n), -jnp.log(n))
    log_nu = jnp.full((b, m), -jnp.log(m))
    # Geometric annealing reaching the final eps at 2/3 of the budget; the
    # remaining third polishes the potentials at the target sharpness.
    q = (eps / eps0) ** (1.0 / max(1, (2 * iters) // 3))

    def body(t, fg):
        f, g = fg
        e = jnp.maximum(eps, eps0 * q ** t)
        f = -e * jax.scipy.special.logsumexp(
            (g[:, None, :] - c0) / e + log_nu[:, None, :], axis=2
        )
        g = -e * jax.scipy.special.logsumexp(
            (f[:, :, None] - c0) / e + log_mu[:, :, None], axis=1
        )
        return f, g

    return jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((b, n)), jnp.zeros((b, m)))
    )
