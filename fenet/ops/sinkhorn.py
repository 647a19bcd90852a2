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
# Streaming mode: row chunks of the cost matrix recomputed from coordinates
# each iteration (the ops/emd.py streaming design); per-chunk temporaries
# bound the reach.
_CHUNK = 256
MAX_N_STREAMING = 8192
_NEG = -1e30  # streaming-LSE "minus infinity" (finite, fp32-safe)


def _sinkhorn_kernel(
    x_ref,  # (1, N, CPAD) in VMEM
    y_ref,  # (1, M, CPAD)
    f_ref,  # (1, N, 1) out f32 (column layout: f is produced by lane-dim
    #         reductions as an (N, 1) column; a (1, N) row output would
    #         need an in-kernel sublane<->lane transpose, which Mosaic
    #         relayout rejects — same layout choice as ops/emd.py's dist)
    g_out_ref,  # (1, 1, M) out f32 (3-D row layout: a 2-D (1, M) block over
    #         a (B, M) array fails Mosaic's block-shape rule for B > 1 —
    #         last two block dims must divide (8, 128) or equal the array
    #         dims; over (B, 1, M) the block's last two dims (1, M) equal
    #         the array's, so any batch lowers)
    c_ref,  # (N, M) scratch f32
    fcol_ref,  # (N, 1) scratch f32
    g_ref,  # (1, M) scratch f32 (row working buffer for the iteration)
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
    f_ref[0, :, :] = fcol_ref[:, :]
    g_out_ref[0, :, :] = g_ref[:, :]


def _sinkhorn_stream_kernel(
    x_ref,  # (1, N, CPAD) in VMEM
    y_ref,  # (1, M, CPAD)
    f_ref,  # (1, N, 1) out f32 (column layout — see _sinkhorn_kernel)
    g_out_ref,  # (1, 1, M) out f32 (3-D row layout — see _sinkhorn_kernel)
    fcol_ref,  # (N, 1) scratch f32
    g_ref,  # (1, M) scratch f32
    gmax_ref,  # (1, M) scratch f32 (streaming-LSE running max)
    gsum_ref,  # (1, M) scratch f32 (streaming-LSE running sum)
    *,
    n: int,
    m: int,
    eps: float,
    iters: int,
    eps0: float,
):
    """Streaming variant for N, M beyond the resident cap: the cost matrix
    is recomputed from coordinates one row-chunk per pass (MXU matmul —
    coords stay in VMEM), and ONE pass per chunk serves both updates: the
    chunk's f rows (lane-dim LSE) and the g update's sublane-dim LSE
    accumulated as a running (max, sum) pair across chunks. Same
    Gauss-Seidel order as the resident kernel and the XLA loop (g uses the
    new f)."""
    x = x_ref[0]
    y = y_ref[0]
    bb = jnp.sum(y * y, axis=1, keepdims=True)  # (M, 1)

    log_mu = -math.log(n)
    log_nu = -math.log(m)
    q = (eps / eps0) ** (1.0 / max(1, (2 * iters) // 3))
    log_q = math.log(q)
    n_chunks = n // _CHUNK

    fcol_ref[:, :] = jnp.zeros((n, 1), jnp.float32)
    g_ref[:, :] = jnp.zeros((1, m), jnp.float32)

    def cost_chunk(c_idx):
        xc = x_ref[0, pl.ds(c_idx * _CHUNK, _CHUNK), :]
        aa = jnp.sum(xc * xc, axis=1, keepdims=True)
        ab = jax.lax.dot_general(
            xc, y, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.maximum(aa + bb.T - 2.0 * ab, 0.0)  # (_CHUNK, M)

    def body(t, _):
        e = jnp.maximum(
            jnp.float32(eps), jnp.float32(eps0) * jnp.exp(log_q * t)
        )
        gmax_ref[:, :] = jnp.full((1, m), _NEG, jnp.float32)
        gsum_ref[:, :] = jnp.zeros((1, m), jnp.float32)

        def chunk(c_idx, _):
            c = cost_chunk(c_idx)
            # f rows of this chunk (reduce over lanes, keepdims).
            z = (g_ref[0:1, :] - c) / e + log_nu
            zmax = jnp.max(z, axis=1, keepdims=True)
            f = -e * (
                jnp.log(jnp.sum(jnp.exp(z - zmax), axis=1, keepdims=True))
                + zmax
            )
            fcol_ref[pl.ds(c_idx * _CHUNK, _CHUNK), :] = f
            # Accumulate the g update's LSE over rows as a running
            # (max, sum): new_max = max(run, chunk);
            # sum <- sum*exp(run-new) + chunk_sum*exp(chunk-new).
            w = (f - c) / e + log_mu
            wmax = jnp.max(w, axis=0, keepdims=True)  # (1, M)
            wsum = jnp.sum(jnp.exp(w - wmax), axis=0, keepdims=True)
            run_max = gmax_ref[0:1, :]
            new_max = jnp.maximum(run_max, wmax)
            gsum_ref[:, :] = (
                gsum_ref[0:1, :] * jnp.exp(run_max - new_max)
                + wsum * jnp.exp(wmax - new_max)
            )
            gmax_ref[:, :] = new_max
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk, 0)
        g_ref[:, :] = -e * (
            jnp.log(gsum_ref[0:1, :]) + gmax_ref[0:1, :]
        )
        return 0

    jax.lax.fori_loop(0, iters, body, 0)
    f_ref[0, :, :] = fcol_ref[:, :]
    g_out_ref[0, :, :] = g_ref[:, :]


@functools.partial(
    jax.jit, static_argnames=("eps", "iters", "eps0", "interpret")
)
def sinkhorn_potentials_stream(
    x: jnp.ndarray,
    y: jnp.ndarray,
    eps: float,
    iters: int,
    eps0: float = 0.25,
    interpret: bool = False,
):
    """Streaming-kernel potentials for N % 256 == 0 up to
    ``MAX_N_STREAMING`` — O(N/chunk) VMEM instead of the O(N*M) resident
    cost matrix."""
    eps0 = max(eps0, eps)  # q <= 1: anneal must not grow past the target
    b, n, _ = x.shape
    m = y.shape[1]
    xp = jnp.zeros((b, n, _COORD_PAD), jnp.float32).at[:, :, :3].set(
        x.astype(jnp.float32)
    )
    yp = jnp.zeros((b, m, _COORD_PAD), jnp.float32).at[:, :, :3].set(
        y.astype(jnp.float32)
    )
    kernel = functools.partial(
        _sinkhorn_stream_kernel, n=n, m=m, eps=eps, iters=iters, eps0=eps0
    )
    f, g = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, _COORD_PAD), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, m, _COORD_PAD), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
        ],
        interpret=interpret,
    )(xp, yp)
    return f[:, :, 0], g[:, 0, :]


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
    eps0 = max(eps0, eps)  # q <= 1: anneal must not grow past the target
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
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, m), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
        ],
        interpret=interpret,
    )(xp, yp)
    return f[:, :, 0], g[:, 0, :]
