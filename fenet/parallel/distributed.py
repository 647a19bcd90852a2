"""Multi-host data parallelism (out-of-scope for reference parity — it is
single-process, SURVEY.md §2.3 — but first-class here).

On a multi-host TPU slice, call :func:`initialize` once per process before
any jax computation; ``make_mesh`` then sees the global device set and the
same shard_map train step scales across hosts (collectives ride ICI within a
slice, DCN across slices — XLA picks per the mesh layout). Each process
feeds only its own slice of every global batch: wrap the dataset in
:class:`ProcessShardDataset` and size the DataLoader with
:func:`local_batch_size`; ``fenet.parallel.mesh.shard_batch`` assembles the
per-process slices into one batch-sharded global array
(``jax.make_array_from_process_local_data``). The train driver wires all of
this up automatically when ``jax.process_count() > 1``.

Validated by a real two-process CPU cluster in tests/test_distributed.py:
cross-process Gloo collectives under the identical shard_map train step.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Env-gated wrapper over jax.distributed.initialize, called
    unconditionally at CLI startup; no-ops on a single host.

    Cluster config, in precedence order: explicit args; a coordinator in
    ``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS`` plus
    ``FENET_NUM_PROCESSES``/``FENET_PROCESS_ID`` (jax itself reads no
    generic process-count/id env vars); or ``FENET_DISTRIBUTED=1`` to run
    jax's argless auto-detection (TPU pod metadata / SLURM / MPI)."""
    import jax

    if coordinator_address is None and num_processes is None:
        import os

        coordinator_address = os.environ.get(
            "JAX_COORDINATOR_ADDRESS"
        ) or os.environ.get("COORDINATOR_ADDRESS")
        force = os.environ.get("FENET_DISTRIBUTED", "").lower() not in (
            "", "0", "false",
        )
        if coordinator_address is None and not force:
            return  # single-host: nothing to do
        n = os.environ.get("FENET_NUM_PROCESSES")
        p = os.environ.get("FENET_PROCESS_ID")
        num_processes = int(n) if n else None
        process_id = int(p) if p else None
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that should own filesystem side effects
    (checkpoints, tensorboard scalars, log files)."""
    import jax

    return jax.process_index() == 0


def local_batch_size(global_batch: int, process_count: Optional[int] = None) -> int:
    """Per-process slice of a global batch; must divide evenly — a ragged
    split would give processes different step counts and deadlock the
    collectives."""
    import jax

    n = process_count if process_count is not None else jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes"
        )
    return global_batch // n


def batch_process_groups(mesh) -> tuple:
    """(group_index, group_count) of this process along ``mesh``'s batch
    axis.

    Processes whose devices hold the SAME batch-axis rows (pure tensor-
    parallel peers on a dp x tp mesh) form one group: they must feed
    identical local batches, so the dataset is sharded per GROUP, not per
    process. On a 1-D batch mesh every process is its own group and this
    degenerates to (process_index, process_count)."""
    import jax

    batch_dim = mesh.axis_names.index("batch")
    coords_by_proc: dict = {}
    import numpy as np

    for idx in np.ndindex(mesh.devices.shape):
        d = mesh.devices[idx]
        coords_by_proc.setdefault(d.process_index, set()).add(idx[batch_dim])
    groups = sorted({tuple(sorted(v)) for v in coords_by_proc.values()})
    mine = tuple(sorted(coords_by_proc[jax.process_index()]))
    return groups.index(mine), len(groups)


def shard_for_process(dataset):
    """Wrap ``dataset`` in :class:`ProcessShardDataset` when running
    multi-host, else return it unchanged — the one-liner the eval CLIs use
    so each process evaluates only its shard (evaluate_dataset re-combines
    the partial sums with an allgather)."""
    import jax

    if jax.process_count() > 1:
        return ProcessShardDataset(dataset)
    return dataset


class ProcessShardDataset:
    """The ``process_index``-th strided shard of a dataset.

    Every process must run the *same number* of steps per epoch (each step is
    a cross-host collective), so shards are padded to equal length by
    wrapping around — at most one duplicate sample per process per epoch,
    the standard distributed-sampler trade. The duplicates sit at the END of
    the shard and their count is exposed as ``wrap_duplicates`` so exact
    consumers (``evaluate_dataset``, the golden recorder) can exclude them
    from metric sums; training simply evaluates them (a sub-1/batch
    duplication of shuffled data). A dataset smaller than the process count
    degenerates to one wrapped sample per process, all marked duplicate on
    the wrapping processes.

    Forwards the optional ``load_batch`` fast path (native C++ batch decode,
    fenet.data.shapenet) through the index mapping.
    """

    def __init__(self, dataset, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        import jax

        pi = jax.process_index() if process_index is None else process_index
        pc = jax.process_count() if process_count is None else process_count
        if not 0 <= pi < pc:
            raise ValueError(f"process_index {pi} out of range for {pc}")
        n = len(dataset)
        if n == 0:
            raise ValueError(f"cannot shard an empty dataset over {pc}")
        idx = np.arange(pi, n, pc)
        wrap = 0
        if len(idx) == 0:  # more processes than samples: the whole shard
            idx = np.asarray([pi % n])  # re-evaluates another process's
            wrap = 1  # sample — every entry is a duplicate
        target = max(-(-n // pc), 1)  # ceil: longest shard's length
        if len(idx) < target:  # pad by wrapping within the shard
            wrap = target - len(idx)
            idx = np.concatenate([idx, idx[:wrap]])
        self.dataset = dataset
        self._indices = idx
        self.wrap_duplicates = wrap

    def __len__(self) -> int:
        return len(self._indices)

    def __getitem__(self, i: int):
        return self.dataset[int(self._indices[i])]

    def load_batch(self, indices):
        load = getattr(self.dataset, "load_batch", None)
        if load is None:
            return None
        return load([int(self._indices[i]) for i in indices])
