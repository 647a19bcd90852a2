"""Point-axis ("sequence") parallelism: ring-sharded Chamfer metrics.

The reference's sequence-length analog is the point count N (SURVEY.md §2.3):
its CUDA kernels hard-cap it — chamfer tiles clouds through 512-point shared
memory chunks (chamfer3D.cu:13) and EMD requires n ≡ 0 (mod 1024) with
batch ≤ 512 (emd_module.py:36-39). fenet's single-chip Pallas kernels stream
N ≤ 8192; this module removes the per-chip ceiling for the Chamfer metric by
sharding the POINT axis over the mesh, the same way ring attention shards
sequence blocks:

- each device holds an N/D slice of cloud A and an M/D slice of cloud B;
- B's blocks rotate around the ring via ``ppermute`` (D steps over ICI, each
  overlapping a local (n_loc × m_loc) MXU distance tile), while every device
  keeps a running (min, argmin, matched-point) for its A slice;
- after D hops every A point has seen all of B without any device ever
  materializing the full (N, M) distance matrix or the full opposite cloud —
  per-device memory is O(N/D + M/D), so the reachable N scales linearly with
  the mesh.

The backward pass mirrors the CUDA scatter (chamfer3D.cu:155-174, atomicAdd
to BOTH clouds) with a second ring: each device's cross-shard gradient
contributions ride an accumulator block that visits every device and comes
home to its owner after D hops — deterministic (fixed addition order), no
atomics.

EMD is deliberately NOT point-sharded: the auction is a sequential global
price war (emd_cuda.cu:256-269) and does not decompose over point blocks;
at metric scales (N ≤ 8192) the single-chip streaming kernel covers it.

Tie-breaking matches the single-device op: among equal minima the LOWEST
global index wins, so results are bit-comparable to ``chamfer_distance_ref``
regardless of ring rotation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fenet.ops.pairwise import pairwise_sqdist
from fenet.parallel.mesh import _shard_map_fn, collective_compiler_options

POINT_AXIS = "points"


def make_point_mesh(n_devices=None) -> Mesh:
    """1-D mesh over the point axis."""
    import numpy as np

    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (POINT_AXIS,))


def _ring_perm(d: int):
    return [(j, (j + 1) % d) for j in range(d)]


def _ring_nn(x1_loc: jnp.ndarray, x2_loc: jnp.ndarray, d: int):
    """Running NN of every local A point over all B blocks on the ring.

    x1_loc: (B, n_loc, 3); x2_loc: (B, m_loc, 3) — this device's B block.
    Returns (sq-dist (B, n_loc), global argmin (B, n_loc), matched points
    (B, n_loc, 3)).
    """
    m_loc = x2_loc.shape[1]
    my = jax.lax.axis_index(POINT_AXIS)

    def body(t, carry):
        block, best_d, best_i, matched = carry
        owner = jnp.mod(my - t, d)  # ring shifted t times -> origin device
        d2 = pairwise_sqdist(x1_loc, block)  # (B, n_loc, m_loc)
        bd = jnp.min(d2, axis=-1)
        bl = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        bi = bl + owner.astype(jnp.int32) * m_loc
        mt = jnp.take_along_axis(block, bl[..., None], axis=1)
        # Strictly-better, or equal with a lower global index: exactly the
        # first-minimum semantics of a full-axis argmin.
        upd = (bd < best_d) | ((bd == best_d) & (bi < best_i))
        best_d = jnp.where(upd, bd, best_d)
        best_i = jnp.where(upd, bi, best_i)
        matched = jnp.where(upd[..., None], mt, matched)
        block = jax.lax.ppermute(block, POINT_AXIS, _ring_perm(d))
        return block, best_d, best_i, matched

    b, n_loc = x1_loc.shape[0], x1_loc.shape[1]
    init = (
        x2_loc,
        jnp.full((b, n_loc), jnp.inf, jnp.float32),
        jnp.full((b, n_loc), jnp.iinfo(jnp.int32).max, jnp.int32),
        jnp.zeros((b, n_loc, 3), jnp.float32),
    )
    _, best_d, best_i, matched = jax.lax.fori_loop(0, d, body, init)
    return best_d, best_i, matched


def _ring_scatter_grad(
    src: jnp.ndarray,  # (B, n_loc, 3) this device's source points
    matched: jnp.ndarray,  # (B, n_loc, 3) their matched opposite points
    idx: jnp.ndarray,  # (B, n_loc) global indices into the opposite cloud
    g: jnp.ndarray,  # (B, n_loc) cotangent of the per-point sq-dists
    m_loc: int,
    d: int,
):
    """Cross-shard half of the Chamfer backward: accumulate
    ``-2 g (src - matched)`` into the opposite cloud at ``idx``.

    An accumulator block per opposite-shard owner rides the ring; each
    device adds its in-range contributions as the block passes, and after
    D hops the block lands back on its owner fully summed. Deterministic
    addition order (ring position), unlike the CUDA atomicAdd.
    """
    b = src.shape[0]
    my = jax.lax.axis_index(POINT_AXIS)
    contrib = (-2.0 * g[..., None] * (src - matched))  # (B, n_loc, 3)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]

    def body(t, acc):
        owner = jnp.mod(my - t, d).astype(jnp.int32)
        local = idx - owner * m_loc
        in_range = (local >= 0) & (local < m_loc)
        safe = jnp.clip(local, 0, m_loc - 1)
        vals = jnp.where(in_range[..., None], contrib, 0.0)
        acc = acc.at[bidx, safe].add(vals)
        return jax.lax.ppermute(acc, POINT_AXIS, _ring_perm(d))

    acc0 = jnp.zeros((b, m_loc, 3), jnp.float32)
    return jax.lax.fori_loop(0, d, body, acc0)


@functools.lru_cache(maxsize=None)
def make_sharded_chamfer(mesh: Mesh):
    """Build ``chamfer(x1, x2) -> (d1, d2, i1, i2)`` sharded over ``mesh``'s
    point axis.

    Same contract as :func:`fenet.ops.chamfer.chamfer_distance`
    (dist_chamfer_3D.py:74-81): per-point squared NN distances both ways,
    int32 global argmin indices, gradients to both clouds. Requires
    N % D == 0 and M % D == 0 (shard_map even-sharding rule; pad the clouds
    if needed). Inputs may be global host arrays or already point-sharded
    device arrays.
    """
    d = mesh.shape[POINT_AXIS]
    spec3 = P(None, POINT_AXIS, None)
    spec2 = P(None, POINT_AXIS)

    def fwd_local(x1, x2):
        d1, i1, m1 = _ring_nn(x1, x2, d)
        d2, i2, m2 = _ring_nn(x2, x1, d)
        return d1, d2, i1, i2, m1, m2

    fwd_sharded = _shard_map_fn(
        fwd_local, mesh=mesh, in_specs=(spec3, spec3),
        out_specs=(spec2, spec2, spec2, spec2, spec3, spec3),
        check_vma=False,
    )
    opts = collective_compiler_options(mesh)
    fwd_sharded = jax.jit(fwd_sharded, compiler_options=opts)

    def bwd_local(x1, x2, i1, i2, m1, m2, g1, g2):
        n_loc, m_loc = x1.shape[1], x2.shape[1]
        # Local halves: d/dx1 of dist1, d/dx2 of dist2.
        dx1 = 2.0 * g1[..., None] * (x1 - m1)
        dx2 = 2.0 * g2[..., None] * (x2 - m2)
        # Cross halves ride the ring home to their owners.
        dx2 = dx2 + _ring_scatter_grad(x1, m1, i1, g1, m_loc, d)
        dx1 = dx1 + _ring_scatter_grad(x2, m2, i2, g2, n_loc, d)
        return dx1, dx2

    bwd_sharded = _shard_map_fn(
        bwd_local, mesh=mesh,
        in_specs=(spec3, spec3, spec2, spec2, spec3, spec3, spec2, spec2),
        out_specs=(spec3, spec3),
        check_vma=False,
    )
    bwd_sharded = jax.jit(bwd_sharded, compiler_options=opts)

    @jax.custom_vjp
    def chamfer(x1, x2):
        d1, d2, i1, i2, _, _ = fwd_sharded(
            x1.astype(jnp.float32), x2.astype(jnp.float32)
        )
        return d1, d2, i1, i2

    def chamfer_fwd(x1, x2):
        x1 = x1.astype(jnp.float32)
        x2 = x2.astype(jnp.float32)
        d1, d2, i1, i2, m1, m2 = fwd_sharded(x1, x2)
        return (d1, d2, i1, i2), (x1, x2, i1, i2, m1, m2)

    def chamfer_bwd(res, cotangents):
        x1, x2, i1, i2, m1, m2 = res
        g1, g2, _, _ = cotangents
        dx1, dx2 = bwd_sharded(x1, x2, i1, i2, m1, m2, g1, g2)
        return dx1, dx2

    chamfer.defvjp(chamfer_fwd, chamfer_bwd)
    return chamfer


def shard_points(tree, mesh: Mesh):
    """device_put (B, N, ...) arrays sharded over the point axis."""
    from jax.sharding import NamedSharding

    sh3 = NamedSharding(mesh, P(None, POINT_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh3) if getattr(x, "ndim", 0) >= 2 else x,
        tree,
    )
