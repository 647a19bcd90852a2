"""Checkpoint save/load with the reference's directory + best-copy semantics,
plus torch-format interop in both directions.

Default format: flax msgpack bytes + JSON metadata sidecar, file
``{cat}_checkpoint_{epoch}.ckpt`` with a ``model_best.ckpt`` copy when both
metrics improve (train.py:220-243). ``fmt='orbax'`` instead writes an orbax
PyTree checkpoint directory (``.orbax`` suffix, same JSON sidecar + best-copy
semantics) — the TPU-ecosystem standard (SURVEY.md §5), useful when
downstream tooling expects orbax layouts; ``load_checkpoint`` auto-detects
either format from the path. Torch interop: ``export_torch_checkpoint``
writes a ``.pth.tar`` the reference's own resume path can read;
``fenet.models.convert.load_torch_checkpoint`` covers the import direction.
"""

from __future__ import annotations

import functools
import json
import os
import shutil
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np


def _flatten(tree: Mapping, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _fetch(leaf, to_host: bool = True):
    """Host copy of a leaf. Fully-replicated multi-process arrays (the dp
    state) read straight off the local replica; arrays actually SHARDED
    across other hosts (multi-host tensor parallelism) are re-assembled by
    a jitted identity with replicated out_shardings — XLA inserts the
    all-gather along the correct mesh axes (axis-aware, unlike a raw
    ``process_allgather`` which concatenates on axis 0). NB that gather is
    a COLLECTIVE: every process must reach it — the train driver calls
    :func:`fetch_arrays` on all processes and only process 0 writes.

    ``to_host=False`` (non-primary processes) still executes the collective
    gathers but skips every device->host copy: on a pure-dp mesh the state
    is fully replicated and non-primary processes would otherwise pull the
    whole params+moments tree (~GBs for A2) to host memory per checkpoint
    just to discard it."""
    if getattr(leaf, "is_fully_addressable", True) or getattr(
        leaf, "is_fully_replicated", False
    ):
        return jax.device_get(leaf) if to_host else None
    gathered = _replicated_gather(leaf.sharding.mesh)(leaf)
    return jax.device_get(gathered) if to_host else None


@functools.cache
def _replicated_gather(mesh):
    """One jitted all-gather-to-replicated per mesh for the process
    lifetime: a fresh ``jax.jit(lambda x: x)`` per leaf per call would
    defeat jit's cache and pay a remote-compile round trip for every
    Megatron leaf at every checkpoint point."""
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, PartitionSpec())
    )


def fetch_arrays(tree, to_host: bool = True):
    """Host numpy copies of every leaf of ``tree``. Under multi-host tensor
    parallelism this is a collective (see :func:`_fetch`) — the driver
    invokes it from EVERY process at each checkpoint point (non-primary
    with ``to_host=False``: collectives run, copies skipped, leaves come
    back None), then only process 0 passes the result to
    :func:`save_checkpoint`."""
    return jax.tree_util.tree_map(lambda x: _fetch(x, to_host), tree)


def _split_state(state: Dict[str, Any]):
    arrays = {
        k: jax.tree_util.tree_map(_fetch, v)
        for k, v in state.items()
        if not isinstance(v, (int, float, str, bool, type(None), dict))
        or isinstance(v, dict)
    }
    meta = {
        k: v
        for k, v in state.items()
        if isinstance(v, (int, float, str, bool, type(None)))
    }
    return arrays, meta


def latest_checkpoint(ckpt_dir: str, category: str,
                      suffix: str = ".ckpt") -> Optional[str]:
    """Path of the newest ``{category}_checkpoint_{epoch}{suffix}`` in
    ``ckpt_dir`` (highest epoch), or None. Lets ``--resume`` fall back to
    a ``--train_save_freq`` periodic checkpoint when no validation epoch
    has produced ``model_best`` yet (crash before the first validate, or
    a run with no val split)."""
    import re

    pat = re.compile(
        re.escape(category) + r"_checkpoint_(\d+)" + re.escape(suffix) + r"$"
    )
    best_epoch, best_path = -1, None
    if not os.path.isdir(ckpt_dir):
        return None
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best_path = os.path.join(ckpt_dir, name)
    return best_path


def save_checkpoint(
    state: Dict[str, Any],
    is_best: bool,
    category: str,
    ckpt_dir: str,
    epoch: int,
    fmt: str = "flax",
) -> str:
    """Reference-compatible entry point (train.py:236-243).

    ``state`` holds arbitrary pytrees (params/batch_stats/opt_state) plus
    scalar metadata. ``fmt`` picks the on-disk container: 'flax' msgpack
    file (default) or an 'orbax' checkpoint directory.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    arrays, meta = _split_state(state)
    suffix = ".orbax" if fmt == "orbax" else ".ckpt"
    filename = os.path.join(
        ckpt_dir, f"{category}_checkpoint_{epoch}{suffix}"
    )
    if fmt == "orbax":
        import orbax.checkpoint as ocp

        if os.path.exists(filename):  # orbax refuses to overwrite
            shutil.rmtree(filename)
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            ckptr.save(os.path.abspath(filename), arrays)
    elif fmt == "flax":
        import flax.serialization

        with open(filename, "wb") as f:
            f.write(flax.serialization.to_bytes(arrays))
    else:
        raise ValueError(f"unknown checkpoint format {fmt!r}")
    with open(filename + ".json", "w") as f:
        json.dump(meta, f)
    if is_best:
        best = os.path.join(ckpt_dir, f"model_best{suffix}")
        if fmt == "orbax":
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(filename, best)
        else:
            shutil.copyfile(filename, best)
        shutil.copyfile(filename + ".json", best + ".json")
    return filename


def _graft(target, raw):
    """Rebuild ``target``'s exact pytree types (dicts, tuples, optax
    namedtuples) from an orbax raw restore, which returns plain
    dicts/lists and ``None`` for empty nodes (e.g. optax EmptyState)."""
    if raw is None:  # empty node — the target's placeholder is already right
        return target
    if isinstance(target, Mapping):
        out = {k: _graft(v, raw[k]) for k, v in target.items()}
        return out if isinstance(target, dict) else type(target)(out)
    if isinstance(target, tuple):
        if hasattr(target, "_fields"):  # namedtuple: raw is a field dict
            return type(target)(
                **{f: _graft(getattr(target, f), raw[f])
                   for f in target._fields}
            )
        return type(target)(_graft(t, r) for t, r in zip(target, raw))
    if isinstance(target, list):
        return [_graft(t, r) for t, r in zip(target, raw)]
    return np.asarray(raw)


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    """Load a checkpoint; with ``target`` provided, restores exact pytree
    structure (required for opt_state). The format is auto-detected: an
    orbax checkpoint is a directory, a flax msgpack checkpoint a file."""
    if not os.path.exists(path):
        # The reference's best checkpoint may exist in the other container.
        alt = (path[: -len(".orbax")] + ".ckpt") if path.endswith(".orbax") \
            else (path[: -len(".ckpt")] + ".orbax" if path.endswith(".ckpt")
                  else None)
        if alt and os.path.exists(alt):
            path = alt
        else:
            raise FileNotFoundError(
                f"checkpoint not found: {path} — train the category first "
                "(checkpoints are written at the validation epochs, default "
                "10/30/50; see --validate_epochs) or point --model at the "
                "right output directory"
            )
    if os.path.isdir(path):  # orbax container
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            raw = ckptr.restore(os.path.abspath(path))
        if target is not None:
            # Map the raw tree onto the target's exact structure (optax
            # namedtuples etc.), allowing PARTIAL targets — the eval CLIs
            # restore params/batch_stats without the saved opt_state.
            arrays = {
                k: _graft(v, raw[k]) if k in raw else v
                for k, v in target.items()
            }
        else:
            arrays = raw
    else:
        import flax.serialization

        with open(path, "rb") as f:
            blob = f.read()
        if target is not None:
            arrays = flax.serialization.from_bytes(target, blob)
        else:
            arrays = flax.serialization.msgpack_restore(blob)
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return {**arrays, **meta}


# ---------------------------------------------------------------------------
# Torch-format export (reverse of fenet.models.convert)
# ---------------------------------------------------------------------------

_TORCH_BN_MAP = {"scale": "weight", "bias": "bias"}
_TORCH_STATS_MAP = {"mean": "running_mean", "var": "running_var"}


def _torch_module_name(path: tuple) -> Optional[str]:
    """fenet variable path -> torch module prefix (inverse of convert.py)."""
    if path[0] == "RepVGG":
        if len(path) == 2 and path[1] == "linear":
            return "RepVGG.linear"
        stage = path[1]
        if "_" in stage:
            s, b = stage.rsplit("_", 1)
            stage = f"{s}.{b}"
        branch = path[2]
        if branch == "rbr_identity":
            return f"RepVGG.{stage}.rbr_identity"
        if branch == "rbr_reparam":
            return f"RepVGG.{stage}.rbr_reparam"
        if branch == "se":
            return f"RepVGG.{stage}.se.{path[3]}"
        base, sub = branch.rsplit("_", 1)  # rbr_dense_conv -> rbr_dense, conv
        return f"RepVGG.{stage}.{base}.{sub}"
    if path[0] == "edge":
        if path[1] == "linear":
            return "linear"
        name, kind = path[1].rsplit("_", 1)  # edge0_conv
        return f"{name}.{'0' if kind == 'conv' else '1'}"
    if path[0] == "decoder":
        return path[1]
    return None


def variables_to_torch_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Convert {'params', 'batch_stats'} into reference torch names/layouts."""
    out: Dict[str, np.ndarray] = {}
    for path, value in _flatten(variables.get("params", {})).items():
        module = _torch_module_name(path[:-1])
        if module is None:
            continue
        leaf = path[-1]
        is_bn = path[-2].endswith("bn") or path[-2] == "rbr_identity"
        if is_bn:
            out[f"{module}.{_TORCH_BN_MAP[leaf]}"] = value
        elif leaf == "kernel":
            if value.ndim == 4:  # conv (kh, kw, I, O) -> (O, I, kh, kw)
                out[f"{module}.weight"] = value.transpose(3, 2, 0, 1)
            elif path[-2].startswith("conv"):  # conv1d (C, O) -> (O, C, 1)
                out[f"{module}.weight"] = value.T[:, :, None]
            else:  # linear (I, O) -> (O, I)
                out[f"{module}.weight"] = value.T
        else:
            out[f"{module}.bias"] = value
    for path, value in _flatten(variables.get("batch_stats", {})).items():
        module = _torch_module_name(path[:-1])
        if module is None:
            continue
        out[f"{module}.{_TORCH_STATS_MAP[path[-1]]}"] = value
    return out


def export_torch_checkpoint(
    variables: Mapping[str, Any], path: str, extra: Optional[dict] = None
):
    """Write a ``.pth.tar`` the reference drivers can consume
    (train.py:122-130 expects {'state_dict': ..., 'epoch': ..., ...})."""
    import torch

    state_dict = {
        k: torch.tensor(v) for k, v in
        variables_to_torch_state_dict(variables).items()
    }
    blob = {"state_dict": state_dict}
    blob.update(extra or {})
    torch.save(blob, path)
