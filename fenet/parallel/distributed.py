"""Multi-host initialization (out-of-scope for reference parity — it is
single-process, SURVEY.md §2.3 — but first-class here).

On a multi-host TPU slice, call :func:`initialize` once per process before
any jax computation; ``make_mesh`` then sees the global device set and the same
shard_map train step scales across hosts (collectives ride ICI within a
slice, DCN across slices — XLA picks per the mesh layout).
"""

from __future__ import annotations

from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Thin wrapper over jax.distributed.initialize; no-ops on single host
    when no coordinator is configured (env- or args-driven)."""
    import jax

    if coordinator_address is None and num_processes is None:
        import os

        if "JAX_COORDINATOR_ADDRESS" not in os.environ and (
            "COORDINATOR_ADDRESS" not in os.environ
        ):
            return  # single-host: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
