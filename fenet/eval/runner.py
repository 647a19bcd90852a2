"""Batched on-device evaluation: forward -> ICP align -> CD/EMD metrics.

Rebuild of the testnet.py / test_pix.py eval loops (testnet.py:28-79,
test_pix.py:23-78) with the per-sample CPU ICP round-trip
(fake.cpu() -> sklearn -> .cuda(), testnet.py:57-67) replaced by a single
jitted sharded step: the whole batch runs model + ICP + metrics on device.
This is where the >=5x/chip eval target is won (BASELINE.json north star).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fenet.eval.metrics import EVAL_EMD_EPS, EVAL_EMD_ITERS, Metrics
from fenet.geometry.icp import align_pred_to_gt
from fenet.ops.chamfer import chamfer_distance
from fenet.ops.emd import earth_mover_distance
from fenet.parallel.mesh import make_mesh, shard_batch, shard_map_batch


# One jitted step per (model config, mesh, metric settings): the 13-category
# eval CLI calls evaluate_dataset once per category, and without this memo
# each call built a fresh closure -> fresh trace + remote-compile round-trip
# even with the persistent cache (minutes of wall clock on this platform).
_EVAL_STEP_CACHE: Dict[tuple, object] = {}


def _local_values(arr):
    """This process's values of a possibly multi-host global array: on a
    mesh spanning several processes the metric outputs are not fully
    addressable, and each process reads back exactly the samples it fed
    (batch-dim shards are per-process contiguous by construction of
    shard_batch). On a tensor-parallel mesh the batch-sharded outputs are
    REPLICATED along the model axis, so several local shards can cover the
    same batch rows — deduplicated by shard start index."""
    import numpy as np

    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    shards = {}
    for s in arr.addressable_shards:
        shards.setdefault(s.index[0].start or 0, s.data)
    return np.concatenate(
        [np.asarray(shards[k]) for k in sorted(shards)]
    )


def make_eval_step(
    model,
    mesh=None,
    icp_iterations: int = 1024,
    icp_tolerance: float = 1e-10,
    icp_rel_tolerance: float = 1e-6,
    icp_patience: int = 32,
    icp_coarse_points: int = 0,
    icp_coarse_iterations: int = 512,
    emd_eps: float = EVAL_EMD_EPS,
    emd_iters: int = EVAL_EMD_ITERS,
    align: bool = True,
):
    """Returns jitted ``step(variables, images, points) -> per-sample metrics``.

    Outputs: dict of (B,) arrays — 'emd' (sqrt-mean x100), 'cd' (x100), plus
    the aligned predictions for visualization.
    """
    mesh = mesh or make_mesh()
    try:  # flax Modules are frozen dataclasses -> hashable for typical configs
        key = (model, mesh, icp_iterations, icp_tolerance,
               icp_rel_tolerance, icp_patience, icp_coarse_points,
               icp_coarse_iterations, emd_eps, emd_iters, align)
        cached = _EVAL_STEP_CACHE.get(key)
    except TypeError:
        key, cached = None, None
    if cached is not None:
        return cached, mesh

    def local_step(variables, images, points):
        # On-device upcast so the pipeline can ship raw uint8 pixels (4x
        # less host->HBM traffic; see data/shapenet.py image_dtype).
        images = images.astype(jnp.float32)
        _, _, pred = model.apply(variables, images, train=False)
        if align:
            aligned = align_pred_to_gt(
                pred, points, max_iterations=icp_iterations,
                tolerance=icp_tolerance, rel_tolerance=icp_rel_tolerance,
                stall_patience=icp_patience,
                coarse_points=icp_coarse_points,
                coarse_iterations=icp_coarse_iterations,
            )
        else:
            aligned = pred
        emd_sq, _ = earth_mover_distance(aligned, points, emd_eps, emd_iters)
        d1, d2, _, _ = chamfer_distance(aligned, points)
        return {
            "emd": jnp.sqrt(emd_sq).mean(axis=1) * 100.0,
            "cd": (d1.mean(axis=1) + d2.mean(axis=1)) * 100.0,
            "pred": aligned,
        }

    sharded = shard_map_batch(
        local_step,
        mesh,
        in_batch_args={1, 2},
        n_args=3,
        out_specs={"emd": P("batch"), "cd": P("batch"), "pred": P("batch")},
    )
    from fenet.parallel.mesh import collective_compiler_options

    step = jax.jit(sharded, compiler_options=collective_compiler_options(mesh))
    if key is not None:
        _EVAL_STEP_CACHE[key] = step
    return step, mesh


def evaluate_dataset(
    model,
    variables,
    dataloader,
    category: str = "",
    logger=None,
    mesh=None,
    **step_kwargs,
) -> Tuple[Metrics, Metrics, Dict[str, float]]:
    """Full-dataset eval; returns (chamfer Metrics, emd Metrics, summary).

    Mirrors test_net's return convention (testnet.py:79): both Metrics carry
    the same [EMD, CD] averages, named for best-checkpoint comparison.
    """
    import numpy as np

    step, mesh = make_eval_step(model, mesh=mesh, **step_kwargs)
    n_dev = mesh.devices.size
    mesh_procs = len({d.process_index for d in mesh.devices.flat})
    # Multi-host: the dataloader yields this process's LOCAL slice (see
    # fenet.parallel.distributed.ProcessShardDataset); pad it so the
    # assembled global batch divides over the full mesh.
    local_dev = n_dev // mesh_procs
    # Wrap-around padding of a ProcessShardDataset sits at the END of the
    # shard (distributed.ProcessShardDataset.wrap_duplicates): those samples
    # still run through the step (equal step counts across processes — each
    # step is a collective) but are excluded from the sums, so multi-host
    # metric totals are EXACT, not duplicate-biased — the golden recorder
    # inherits this.
    shard_ds = getattr(dataloader, "dataset", None)
    n_dup = int(getattr(shard_ds, "wrap_duplicates", 0))
    tally_limit = (len(shard_ds) - n_dup) if shard_ds is not None else None
    emd_sum = cd_sum = 0.0
    n_samples = seen = 0
    t0 = time.time()
    # One-deep software pipeline: reading a batch's metrics back
    # (``_local_values`` -> np.asarray) blocks the host until the step
    # drains, so tallying batch i only AFTER batch i+1 is dispatched lets
    # XLA overlap i+1's host->device transfer with i's compute — on this
    # platform the end-to-end eval is transfer-bound (~23 MB/s tunnel) and
    # the un-pipelined loop serialized the two. Depth 1 holds at most two
    # batches of outputs on device (metrics + (B,N,3) aligned preds).
    pending = None  # (out, valid, take, batch_index) awaiting readback

    def _tally(entry):
        nonlocal emd_sum, cd_sum, n_samples
        out, valid, take, i = entry
        emd = _local_values(out["emd"])[:valid]
        cd = _local_values(out["cd"])[:valid]
        emd_sum += float(emd[:take].sum())
        cd_sum += float(cd[:take].sum())
        n_samples += take
        if logger is not None:
            logger.info(
                "Test[%d/%d] Taxonomy = %s Metrics = %s",
                i, len(dataloader), category,
                ["%.4f" % m for m in (emd.mean(), cd.mean())],
            )

    for i, batch in enumerate(dataloader, start=1):
        images, points = batch["image"], batch["points"]
        valid = images.shape[0]
        pad = (-valid) % local_dev  # shard_map needs divisible batches
        if pad:
            images = np.concatenate([images, images[-1:].repeat(pad, 0)])
            points = np.concatenate([points, points[-1:].repeat(pad, 0)])
        sharded = shard_batch({"image": images, "points": points}, mesh)
        out = step(variables, sharded["image"], sharded["points"])
        take = valid  # duplicate-exclusion accounting at SUBMISSION order
        if tally_limit is not None:
            take = min(valid, max(tally_limit - seen, 0))
        seen += valid
        if pending is not None:
            _tally(pending)
        pending = (out, valid, take, i)
    if pending is not None:
        _tally(pending)
    wall = time.time() - t0
    if mesh_procs > 1:  # combine the per-process partial sums
        from jax.experimental import multihost_utils

        from fenet.parallel.distributed import batch_process_groups

        totals = multihost_utils.process_allgather(
            np.asarray([emd_sum, cd_sum, float(n_samples)])
        ).sum(axis=0)
        # Tensor-parallel peer processes evaluate IDENTICAL batch rows
        # (datasets shard per batch group), so their partial sums repeat
        # group-size times in the allgather — normalize them away.
        dup = mesh_procs // batch_process_groups(mesh)[1]
        emd_sum, cd_sum, n_samples = (
            float(totals[0]) / dup, float(totals[1]) / dup,
            int(round(totals[2] / dup)),
        )
    avg = [emd_sum / max(n_samples, 1), cd_sum / max(n_samples, 1)]
    summary = {
        "EMD_distance": avg[0],
        "ChamferDistance": avg[1],
        "samples": n_samples,
        "wall_seconds": wall,
        "samples_per_second": n_samples / wall if wall > 0 else 0.0,
    }
    return (
        Metrics("ChamferDistance", avg),
        Metrics("EMD_distance", avg),
        summary,
    )
