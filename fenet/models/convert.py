"""PyTorch checkpoint <-> Flax variables conversion.

Interops with the reference's on-disk formats:

- ``pretrained_models/RepVGG-A2-train.pth`` — a bare RepVGG state_dict force-
  loaded by create_RepVGG_A2 (…_cmlp.py:350-353);
- ``{cat}_checkpoint_{epoch}.pth.tar`` / ``model_best.pth.tar`` — dicts with a
  ``state_dict`` entry for the full generator (train.py:220-228).

Layout rules:
  conv2d   (O, I, kh, kw) <-> (kh, kw, I, O)
  conv1d k=1 (O, C, 1)    <-> Dense (C, O)
  linear   (O, I)         <-> Dense (I, O)
  batchnorm weight/bias/running_mean/running_var <-> scale/bias + batch_stats

Name rules (torch generator, train.py's model, -> fenet Generator):
  RepVGG.stageS.B.rbr_X.* -> RepVGG/stageS_B/rbr_X_*   (stage0 has no index)
  RepVGG.linear.*         -> RepVGG/linear
  edge0.0/edge0.1         -> edge/edge0_conv, edge/edge0_bn   (same for edge2)
  linear.*                -> edge/linear
  fc*, conv1_*, conv2_1   -> decoder/*
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_BN_MAP = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _module_path(torch_name: str) -> Tuple[Tuple[str, ...], str]:
    """Map a torch module prefix to (fenet path prefix, kind).

    kind in {conv, bn, linear, conv1d}; raises KeyError for unused modules
    (e.g. the dead edge1 branch, …_cmlp.py:222-226).
    """
    m = re.match(r"RepVGG\.stage(\d+)(?:\.(\d+))?\.(rbr_\w+)\.?(conv|bn)?$",
                 torch_name)
    if m:
        stage, block, branch, sub = m.groups()
        name = f"stage{stage}" if block is None else f"stage{stage}_{block}"
        if branch == "rbr_identity":
            return ("RepVGG", name, "rbr_identity"), "bn"
        if branch == "rbr_reparam":
            return ("RepVGG", name, "rbr_reparam"), "conv"
        return ("RepVGG", name, f"{branch}_{sub}"), sub
    m = re.match(r"RepVGG\.stage(\d+)(?:\.(\d+))?\.se\.(down|up)$", torch_name)
    if m:
        stage, block, half = m.groups()
        name = f"stage{stage}" if block is None else f"stage{stage}_{block}"
        return ("RepVGG", name, "se", half), "linear"
    if torch_name == "RepVGG.linear":
        return ("RepVGG", "linear"), "linear"
    m = re.match(r"edge([02])\.([01])$", torch_name)
    if m:
        idx, sub = m.groups()
        kind = "conv" if sub == "0" else "bn"
        return ("edge", f"edge{idx}_{kind}"), kind
    if torch_name == "linear":
        return ("edge", "linear"), "linear"
    m = re.match(r"(fc\d(?:_\d)?)$", torch_name)
    if m:
        return ("decoder", m.group(1)), "linear"
    m = re.match(r"(conv\d_\d)$", torch_name)
    if m:
        return ("decoder", m.group(1)), "conv1d"
    raise KeyError(torch_name)


def torch_state_dict_to_variables(
    state_dict: Mapping[str, Any],
    prefix_map=None,
    strict: bool = False,
) -> Dict[str, Any]:
    """Convert a torch generator/RepVGG state_dict to {'params', 'batch_stats'}.

    Unknown keys (dead modules, num_batches_tracked) are skipped unless
    ``strict``. ``prefix_map`` optionally rewrites torch name prefixes first
    (e.g. {'': 'RepVGG.'} to load a bare RepVGG-A2 backbone state_dict).
    """
    variables: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for name, tensor in state_dict.items():
        for old, new in (prefix_map or {}).items():
            if name.startswith(old):
                name = new + name[len(old):]
                break
        if name.endswith("num_batches_tracked"):
            continue
        module, leaf = name.rsplit(".", 1)
        try:
            path, kind = _module_path(module)
        except KeyError:
            if strict:
                raise
            continue
        value = _to_numpy(tensor).astype(np.float32)
        if kind == "bn":
            col, leaf_name = _BN_MAP[leaf]
            _set(variables[col], path + (leaf_name,), value)
        elif kind == "conv":
            if leaf == "weight":
                _set(variables["params"], path + ("kernel",),
                     value.transpose(2, 3, 1, 0))
            else:
                _set(variables["params"], path + ("bias",), value)
        elif kind == "conv1d":
            if leaf == "weight":
                _set(variables["params"], path + ("kernel",), value[:, :, 0].T)
            else:
                _set(variables["params"], path + ("bias",), value)
        else:  # linear
            if leaf == "weight":
                _set(variables["params"], path + ("kernel",), value.T)
            else:
                _set(variables["params"], path + ("bias",), value)
    return variables


def load_torch_checkpoint(path: str, prefix_map=None) -> Dict[str, Any]:
    """Load a reference ``.pth.tar``/``.pth`` file into flax variables.

    Accepts both full checkpoint dicts (with 'state_dict') and bare
    state_dicts, like the reference's resume paths (train.py:122-130).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return torch_state_dict_to_variables(state_dict, prefix_map=prefix_map)


def merge_variables(base: Mapping[str, Any], override: Mapping[str, Any]):
    """Recursively overlay converted weights onto freshly-initialized ones
    (covers params absent from a partial torch checkpoint)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge_variables(out[k], v)
        else:
            out[k] = v
    return out
