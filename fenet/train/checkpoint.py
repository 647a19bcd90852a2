"""Checkpoint save/load with the reference's directory + best-copy semantics,
plus torch-format interop in both directions.

Native format: flax msgpack bytes + JSON metadata sidecar, file
``{cat}_checkpoint_{epoch}.ckpt`` with a ``model_best.ckpt`` copy when both
metrics improve (train.py:220-243). Torch interop: ``export_torch_checkpoint``
writes a ``.pth.tar`` the reference's own resume path can read;
``fenet.models.convert.load_torch_checkpoint`` covers the import direction.
"""

from __future__ import annotations

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


def save_checkpoint(
    state: Dict[str, Any],
    is_best: bool,
    category: str,
    ckpt_dir: str,
    epoch: int,
) -> str:
    """Reference-compatible entry point (train.py:236-243).

    ``state`` holds arbitrary pytrees (params/batch_stats/opt_state) plus
    scalar metadata.
    """
    import flax.serialization

    os.makedirs(ckpt_dir, exist_ok=True)
    filename = os.path.join(ckpt_dir, f"{category}_checkpoint_{epoch}.ckpt")
    arrays = {
        k: jax.device_get(v)
        for k, v in state.items()
        if not isinstance(v, (int, float, str, bool, type(None), dict))
        or isinstance(v, dict)
    }
    meta = {
        k: v
        for k, v in state.items()
        if isinstance(v, (int, float, str, bool, type(None)))
    }
    with open(filename, "wb") as f:
        f.write(flax.serialization.to_bytes(arrays))
    with open(filename + ".json", "w") as f:
        json.dump(meta, f)
    if is_best:
        best = os.path.join(ckpt_dir, "model_best.ckpt")
        shutil.copyfile(filename, best)
        shutil.copyfile(filename + ".json", best + ".json")
    return filename


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    """Load a checkpoint; with ``target`` provided, restores exact pytree
    structure (required for opt_state)."""
    import flax.serialization

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint not found: {path} — train the category first "
            "(checkpoints are written at the validation epochs, default "
            "10/30/50; see --validate_epochs) or point --model at the "
            "right output directory"
        )
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
