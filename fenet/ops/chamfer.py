"""Chamfer distance: Pallas TPU kernel + jnp reference, with custom VJP.

TPU-native replacement for the reference CUDA extension
``metric/chamfer3D`` (chamfer3D.cu:12-195, dist_chamfer_3D.py:29-81):

- same contract: ``chamfer_distance(xyz1, xyz2) -> (dist1, dist2, idx1, idx2)``
  with *squared* L2 nearest-neighbour distances in both directions and the
  argmin indices (dist_chamfer_3D.py:54 returns exactly this 4-tuple);
- same gradient: the CUDA backward scatters ``2*g*(x1-x2)`` to both clouds
  through the saved indices with atomicAdd (chamfer3D.cu:155-174). Here the
  scatter is a deterministic ``.at[].add`` (XLA scatter-add) — no atomics.

Instead of the reference's shared-memory tiling (512-point chunks of cloud B,
chamfer3D.cu:13), the Pallas kernel tiles cloud A over the grid and keeps all
of cloud B resident in VMEM; the cross term runs on the MXU and the row-min /
argmin on the VPU, so the (N, M) distance matrix never touches HBM. Beyond
M = 8192 (where cloud B no longer fits VMEM) a STREAMING variant tiles B
over an inner grid axis and folds a running min/argmin in the resident
output block — single-chip chamfer at any cloud size with zero HBM
intermediates (the SP ring in fenet.parallel.sp additionally shards the
point axis across a mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fenet.ops.pairwise import pairwise_sqdist

# Tile of cloud-A points processed per grid step.
_TILE_N = 512
# Coordinates are padded 3 -> _COORD_PAD so the MXU contraction has a clean K.
_COORD_PAD = 8
# Largest (TILE_N, M) block we allow in VMEM before switching to the
# streaming kernel (cloud B tiled over an inner grid axis, running
# min/argmin accumulated in the resident output block).
_MAX_M_IN_VMEM = 8192
# B-cloud tile of the streaming kernel: the (TILE_N, TILE_M) distance block
# is 2 MB fp32 — comfortably inside VMEM at any cloud size.
_TILE_M = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# jnp reference (oracle + CPU/odd-shape fallback)
# ---------------------------------------------------------------------------


def _nn_ref(a: jnp.ndarray, b: jnp.ndarray):
    """Directional NN: for each point of a, min sq-dist and argmin into b."""
    d = pairwise_sqdist(a, b)
    return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)


def chamfer_distance_ref(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """Pure-XLA chamfer. Same outputs as :func:`chamfer_distance`."""
    dist1, idx1 = _nn_ref(xyz1, xyz2)
    dist2, idx2 = _nn_ref(xyz2, xyz1)
    return dist1, dist2, idx1, idx2


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _nn_kernel(x1_ref, x2_ref, dist_ref, idx_ref, *, m_valid: int):
    """One (batch, A-tile) grid step: NN of a TILE_N slab of A into all of B.

    x1_ref: (1, TILE_N, COORD_PAD) slab of cloud A (zero-padded coords).
    x2_ref: (1, M_pad, COORD_PAD) all of cloud B.
    dist_ref/idx_ref: (1, TILE_N) outputs.
    """
    a = x1_ref[0]  # (TILE_N, C)
    b = x2_ref[0]  # (M_pad, C)

    aa = jnp.sum(a * a, axis=1, keepdims=True)  # (TILE_N, 1)
    bb = jnp.sum(b * b, axis=1, keepdims=True)  # (M_pad, 1)
    ab = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # full-fp32 MXU passes
    )  # (TILE_N, M_pad) on the MXU
    d = jnp.maximum(aa + bb.T - 2.0 * ab, 0.0)

    # Mask out the M padding so argmin never lands on a pad column.
    m_pad = d.shape[1]
    if m_valid != m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d = jnp.where(col < m_valid, d, jnp.float32(3.4e38))

    dist_ref[0, :, :] = jnp.min(d, axis=1, keepdims=True)
    idx_ref[0, :, :] = jnp.argmin(d, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nn_pallas(xyz1: jnp.ndarray, xyz2: jnp.ndarray, interpret: bool = False):
    """Directional NN via Pallas. xyz1 (B,N,3), xyz2 (B,M,3) -> (B,N),(B,N)."""
    b, n, _ = xyz1.shape
    _, m, _ = xyz2.shape
    n_pad = _round_up(n, _TILE_N)
    m_pad = _round_up(m, 128)

    # Pad A with far-away points (results sliced off), B coords with zeros
    # (masked in-kernel), and the coordinate axis up to the MXU-friendly K.
    x1 = jnp.pad(
        xyz1, ((0, 0), (0, n_pad - n), (0, _COORD_PAD - 3)), constant_values=0.0
    )
    x2 = jnp.pad(
        xyz2, ((0, 0), (0, m_pad - m), (0, _COORD_PAD - 3)), constant_values=0.0
    )

    grid = (b, n_pad // _TILE_N)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel, m_valid=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, _TILE_N, _COORD_PAD),
                lambda bi, ni: (bi, ni, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, m_pad, _COORD_PAD),
                lambda bi, ni: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, _TILE_N, 1), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _TILE_N, 1), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x1, x2)
    return dist[:, :n, 0], idx[:, :n, 0]


def _nn_stream_kernel(x1_ref, x2_ref, dist_ref, idx_ref, *,
                      m_valid: int, tile_m: int):
    """One (batch, A-tile, B-tile) grid step of the STREAMING kernel: NN of
    a TILE_N slab of A into a TILE_M slab of B, folded into the running
    min/argmin. The output block's index map ignores the B-tile axis, so
    the same (1, TILE_N, 1) blocks stay resident in VMEM across the inner
    loop — the (N, M) distance matrix never exists anywhere, lifting the
    reference CUDA kernel's shared-memory size cap (chamfer3D.cu:13) and
    round 2's M <= 8192 VMEM cap in one stroke.
    """
    mi = pl.program_id(2)
    a = x1_ref[0]  # (TILE_N, C)
    b = x2_ref[0]  # (TILE_M, C)

    aa = jnp.sum(a * a, axis=1, keepdims=True)
    bb = jnp.sum(b * b, axis=1, keepdims=True)
    ab = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TILE_N, TILE_M) on the MXU
    d = jnp.maximum(aa + bb.T - 2.0 * ab, 0.0)

    # Mask pad columns by their GLOBAL index so only real B points compete.
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + mi * tile_m
    d = jnp.where(col < m_valid, d, jnp.float32(3.4e38))

    local_min = jnp.min(d, axis=1, keepdims=True)  # (TILE_N, 1)
    local_arg = (
        jnp.argmin(d, axis=1, keepdims=True).astype(jnp.int32) + mi * tile_m
    )

    @pl.when(mi == 0)
    def _init():
        dist_ref[0, :, :] = local_min
        idx_ref[0, :, :] = local_arg

    @pl.when(mi > 0)
    def _fold():
        prev = dist_ref[0, :, :]
        # Strict < keeps the EARLIEST tile's index on ties, and the in-tile
        # argmin picks the first minimum — together the global first-argmin
        # semantics of the reference (and of jnp.argmin) are preserved.
        better = local_min < prev
        dist_ref[0, :, :] = jnp.where(better, local_min, prev)
        idx_ref[0, :, :] = jnp.where(better, local_arg, idx_ref[0, :, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nn_pallas_stream(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                      interpret: bool = False):
    """Streaming directional NN for clouds too large for a VMEM-resident B.
    xyz1 (B,N,3), xyz2 (B,M,3) -> (B,N) min sq-dists, (B,N) argmins."""
    b, n, _ = xyz1.shape
    _, m, _ = xyz2.shape
    n_pad = _round_up(n, _TILE_N)
    m_pad = _round_up(m, _TILE_M)

    x1 = jnp.pad(
        xyz1, ((0, 0), (0, n_pad - n), (0, _COORD_PAD - 3)),
        constant_values=0.0,
    )
    x2 = jnp.pad(
        xyz2, ((0, 0), (0, m_pad - m), (0, _COORD_PAD - 3)),
        constant_values=0.0,
    )

    grid = (b, n_pad // _TILE_N, m_pad // _TILE_M)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_stream_kernel, m_valid=m, tile_m=_TILE_M),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, _TILE_N, _COORD_PAD),
                lambda bi, ni, mi: (bi, ni, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _TILE_M, _COORD_PAD),
                lambda bi, ni, mi: (bi, mi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, _TILE_N, 1), lambda bi, ni, mi: (bi, ni, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _TILE_N, 1), lambda bi, ni, mi: (bi, ni, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x1, x2)
    return dist[:, :n, 0], idx[:, :n, 0]


def _nn_dispatch(a: jnp.ndarray, b: jnp.ndarray):
    """Resident-B kernel when B fits VMEM, streaming kernel beyond."""
    if b.shape[1] <= _MAX_M_IN_VMEM:
        return _nn_pallas(a, b)
    return _nn_pallas_stream(a, b)


def _use_pallas(xyz1, xyz2) -> bool:
    # Any size: the streaming kernel covers clouds beyond the VMEM cap.
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


@jax.custom_vjp
def chamfer_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """Bidirectional chamfer distance.

    Args:
      xyz1: (B, N, 3) float32 point cloud ("pred" in the reference drivers).
      xyz2: (B, M, 3) float32 point cloud ("gt").

    Returns:
      ``(dist1, dist2, idx1, idx2)`` — (B,N)/(B,M) squared NN distances and
      (B,N)/(B,M) int32 argmin indices, matching dist_chamfer_3D.py:74-81.
    """
    return _chamfer_fwd_impl(xyz1, xyz2)


def _chamfer_fwd_impl(xyz1, xyz2):
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    if _use_pallas(xyz1, xyz2):
        dist1, idx1 = _nn_dispatch(xyz1, xyz2)
        dist2, idx2 = _nn_dispatch(xyz2, xyz1)
    else:
        dist1, dist2, idx1, idx2 = chamfer_distance_ref(xyz1, xyz2)
    return dist1, dist2, idx1, idx2


def _chamfer_fwd(xyz1, xyz2):
    out = _chamfer_fwd_impl(xyz1, xyz2)
    dist1, dist2, idx1, idx2 = out
    return out, (xyz1, xyz2, idx1, idx2)


def _chamfer_bwd(res, cotangents):
    xyz1, xyz2, idx1, idx2 = res
    g1, g2, _, _ = cotangents  # no gradient through integer indices

    bidx = jnp.arange(xyz1.shape[0])[:, None]

    # d dist1_i / d xyz1_i = 2 (x1_i - x2_{idx1_i}); opposite sign into xyz2,
    # scattered through idx1 (chamfer3D.cu:155-174 with atomicAdd -> .at[].add).
    diff1 = xyz1 - xyz2[bidx, idx1]
    grad1 = 2.0 * g1[..., None] * diff1
    diff2 = xyz2 - xyz1[bidx, idx2]
    grad2 = 2.0 * g2[..., None] * diff2

    dxyz1 = grad1 + jnp.zeros_like(xyz1).at[bidx, idx2].add(-grad2)
    dxyz2 = grad2 + jnp.zeros_like(xyz2).at[bidx, idx1].add(-grad1)
    return dxyz1, dxyz2


chamfer_distance.defvjp(_chamfer_fwd, _chamfer_bwd)
