"""Device mesh + data-parallel sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.3); this module is
the TPU-native scaling layer it lacks: a 1-D ``batch`` mesh with batch-sharded
inputs and replicated params. Gradients/metrics are combined with
``psum``-style collectives over ICI via ``shard_map``; the Pallas kernels see
per-shard shapes, so they run unmodified on every chip.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # moved out of experimental in recent jax
    from jax import shard_map as _shard_map_fn
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_fn

BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None, axis: str = BATCH_AXIS) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a pytree of (B, ...) arrays batch-sharded over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if getattr(x, "ndim", 0) >= 1 else x,
        batch,
    )


def shard_map_batch(fn, mesh: Mesh, in_batch_args, n_args, out_specs):
    """shard_map ``fn`` with the given arg positions batch-sharded, the rest
    replicated. ``out_specs`` follow shard_map conventions."""
    in_specs = tuple(
        P(BATCH_AXIS) if i in in_batch_args else P() for i in range(n_args)
    )
    return _shard_map_fn(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


def pmean(tree: Any, axis: str = BATCH_AXIS) -> Any:
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis), tree)
