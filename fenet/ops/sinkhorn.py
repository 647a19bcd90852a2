"""Pallas TPU kernel for annealed log-domain Sinkhorn potentials.

The XLA implementation of ``losses.sinkhorn.sinkhorn_emd_loss`` re-reads the
(B, N, M) cost matrix from HBM twice per iteration — at the training shape
(128, 1024, 1024) that is ~1 GB of HBM traffic per iteration, several
hundred times. This kernel keeps everything resident in VMEM per sample
(coords 16 KB, cost matrix 4 MB at N=M=1024, potentials 8 KB), computes the
cost matrix once from coordinates, and runs the whole annealed iteration
loop on the VPU with zero per-iteration HBM traffic — the same
VMEM-residency design as the auction kernel (ops/emd.py).

Only the POTENTIALS come out of the kernel ((B, N) + (B, M), a few KB):
they are used detached (the detached-plan gradient rule), so the caller
rebuilds the plan and the differentiable cost contraction in XLA with one
(B, N, M) materialization total.

No reference-code counterpart (the reference has no Sinkhorn path on GPU;
its geomloss import at loss/loss_.py:111-120 is the semantic anchor).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Coordinate padding for MXU-friendly contractions (matches ops/emd.py).
_COORD_PAD = 8
# (N, M) cost matrix + one exp temporary must fit VMEM (~16 MB/core).
MAX_N_IN_VMEM = 1024


def _sinkhorn_kernel(
    x_ref,  # (1, N, CPAD) in VMEM
    y_ref,  # (1, M, CPAD)
    f_ref,  # (1, N) out f32
    g_ref,  # (1, M) out f32
    c_ref,  # (N, M) scratch f32
    fcol_ref,  # (N, 1) scratch f32
    *,
    n: int,
    m: int,
    eps: float,
    iters: int,
    eps0: float,
):
    x = x_ref[0]  # (N, CPAD), pad coords are zero
    y = y_ref[0]
    aa = jnp.sum(x * x, axis=1, keepdims=True)  # (N, 1)
    bb = jnp.sum(y * y, axis=1, keepdims=True)  # (M, 1)
    ab = jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    c_ref[:, :] = jnp.maximum(aa + bb.T - 2.0 * ab, 0.0)

    log_mu = -math.log(n)  # uniform marginals: scalars, not vectors
    log_nu = -math.log(m)
    # Geometric annealing to the final eps at 2/3 of the budget (mirrors
    # losses.sinkhorn.sinkhorn_emd_loss exactly).
    q = (eps / eps0) ** (1.0 / max(1, (2 * iters) // 3))
    log_q = math.log(q)

    fcol_ref[:, :] = jnp.zeros((n, 1), jnp.float32)
    g_ref[:, :] = jnp.zeros((1, m), jnp.float32)

    def body(t, _):
        e = jnp.maximum(
            jnp.float32(eps), jnp.float32(eps0) * jnp.exp(log_q * t)
        )
        c = c_ref[:, :]
        # f_i = -e * LSE_j[(g_j - C_ij)/e + log_nu]  (reduce over lanes,
        # keepdims — 1-D lane reductions trip Mosaic relayout)
        z = (g_ref[0:1, :] - c) / e + log_nu
        zmax = jnp.max(z, axis=1, keepdims=True)
        f = -e * (
            jnp.log(jnp.sum(jnp.exp(z - zmax), axis=1, keepdims=True))
            + zmax
        )
        fcol_ref[:, :] = f
        # g_j = -e * LSE_i[(f_i - C_ij)/e + log_mu]  (reduce over sublanes)
        w = (f - c) / e + log_mu
        wmax = jnp.max(w, axis=0, keepdims=True)
        g_ref[:, :] = -e * (
            jnp.log(jnp.sum(jnp.exp(w - wmax), axis=0, keepdims=True))
            + wmax
        )
        return 0

    jax.lax.fori_loop(0, iters, body, 0)
    f_ref[:, :] = fcol_ref[:, :].reshape(1, n)


@functools.partial(
    jax.jit, static_argnames=("eps", "iters", "eps0", "interpret")
)
def sinkhorn_potentials(
    x: jnp.ndarray,
    y: jnp.ndarray,
    eps: float,
    iters: int,
    eps0: float = 0.25,
    interpret: bool = False,
):
    """Converged annealed Sinkhorn potentials (f, g) for uniform point-cloud
    marginals under squared-euclidean cost; x (B, N, 3), y (B, M, 3) ->
    (B, N), (B, M). VMEM-resident Pallas path for N, M <= 1024; the caller
    (losses.sinkhorn) falls back to the XLA loop beyond that."""
    b, n, _ = x.shape
    m = y.shape[1]
    xp = jnp.zeros((b, n, _COORD_PAD), jnp.float32).at[:, :, :3].set(
        x.astype(jnp.float32)
    )
    yp = jnp.zeros((b, m, _COORD_PAD), jnp.float32).at[:, :, :3].set(
        y.astype(jnp.float32)
    )
    kernel = functools.partial(
        _sinkhorn_kernel, n=n, m=m, eps=eps, iters=iters, eps0=eps0
    )
    f, g = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, _COORD_PAD), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, m, _COORD_PAD), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n), lambda i: (i, 0)),
            pl.BlockSpec((1, m), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((b, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, m), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xp, yp)
    return f, g
