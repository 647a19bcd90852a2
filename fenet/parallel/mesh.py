"""Device mesh + data-parallel sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.3); this module is
the TPU-native scaling layer it lacks: a 1-D ``batch`` mesh with batch-sharded
inputs and replicated params. Gradients/metrics are combined with
``psum``-style collectives over ICI via ``shard_map``; the Pallas kernels see
per-shard shapes, so they run unmodified on every chip.
"""

from __future__ import annotations

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
    """device_put a pytree of (B, ...) arrays batch-sharded over the mesh.

    Single-process: ``batch`` is the full global batch. Multi-process (a mesh
    spanning several hosts): ``batch`` is this process's LOCAL slice — global
    batch-sharded arrays are assembled from the per-process slices without
    any cross-host data movement (each host's samples land on its own
    devices; see fenet.parallel.distributed.ProcessShardDataset).
    """
    sh = batch_sharding(mesh)
    multi = len({d.process_index for d in mesh.devices.flat}) > 1

    def put(x):
        if getattr(x, "ndim", 0) < 1:
            return x
        if multi:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def shard_map_batch(fn, mesh: Mesh, in_batch_args, n_args, out_specs):
    """shard_map ``fn`` with the given arg positions batch-sharded, the rest
    replicated. ``out_specs`` follow shard_map conventions.

    On a 1-D mesh the body is fully manual (each device sees its batch
    shard).  On a 2-D (batch, model) tensor-parallel mesh only ``batch`` is
    manual; the ``model`` axis stays *auto* so GSPMD partitions the
    Megatron-annotated matmuls and places their all-reduces itself
    (fenet.parallel.tp)."""
    in_specs = tuple(
        P(BATCH_AXIS) if i in in_batch_args else P() for i in range(n_args)
    )
    kwargs = {}
    if len(mesh.axis_names) > 1:
        kwargs["axis_names"] = {BATCH_AXIS}
    return _shard_map_fn(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False, **kwargs,
    )


def pmean(tree: Any, axis: str = BATCH_AXIS) -> Any:
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis), tree)


def collective_compiler_options(mesh: Optional[Mesh] = None):
    """XLA compiler options for jitted programs containing collectives.

    On the CPU backend (the virtual multi-chip mesh used by tests and the
    driver's ``dryrun_multichip``), XLA's in-process collective rendezvous
    terminates the whole process when the gap between the first and last
    participant exceeds 40s. With more virtual devices than host cores the
    per-partition compute serializes onto the real cores, so that gap is
    roughly (n_devices - 1) x per-shard step time — trivially exceeded on a
    small host even though the program is making progress. Raise the
    watchdog timeouts so virtual-mesh runs are bounded by actual compute,
    not by a wall-clock heuristic sized for real multi-core hosts.

    Returns ``None`` on TPU (ICI collectives have their own transport-level
    timeouts; these flags are CPU-runtime-only).
    """
    devices = mesh.devices.flatten() if mesh is not None else jax.devices()
    if devices[0].platform != "cpu" or len(devices) < 2:
        return None
    return {
        "xla_cpu_collective_call_warn_stuck_seconds": "600",
        "xla_cpu_collective_call_terminate_timeout_seconds": "3000",
        "xla_cpu_collective_timeout_seconds": "3000",
    }
