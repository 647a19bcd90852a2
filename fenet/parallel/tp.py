"""Tensor-parallel (Megatron-style) sharding for the cascaded generator.

The reference is single-GPU (SURVEY.md §2.3) and its generator is dominated
by one giant fully-connected pair in the decoder's fine head
(repvgg_edge_nose_NEW_cmlp.py:247-254): ``fc1_1`` (1024 -> 256*512, 134M
params — ~80% of the whole model) followed by the per-point ``conv1_1``
(512 -> 512).  On a TPU slice that pair maps onto the classic Megatron
column/row split over a ``model`` mesh axis:

- ``fc1_1``: column parallel — kernel ``P(None, 'model')``, bias
  ``P('model')``.  Splitting the 131072 output features in channel-major
  order splits the (fine_width, 256) reshape along its channel axis, so the
  downstream per-point feature dim is evenly sharded.
- ``conv1_1``: row parallel — kernel ``P('model', None)``, bias replicated.
  Each shard contributes a partial matmul; XLA inserts ONE all-reduce over
  ICI at its output.  Everything after (conv1_2/conv1_3, the point adds)
  is replicated.
- The mid head's ``fc2_1``/``conv2_1`` (8.4M params) form the same pair and
  get the same treatment.

The split is expressed as GSPMD sharding annotations, not hand-written
collectives: the training step stays ``shard_map``-manual over ``batch``
(the Pallas loss kernels see per-shard batches) and *auto* over ``model``
(``axis_names={'batch'}``), so XLA partitions the big matmuls and places
the all-reduce itself.  Grads, Adam moments, and updates of the split
params stay model-sharded end-to-end — the optimizer state for the 134M
fine head never materializes on one chip.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
MODEL_AXIS = "model"

# (path regex, spec) — first match wins; paths are '/'-joined tree keys so
# the same table covers params, grads, and the Adam mu/nu mirrors inside
# opt_state.
_RULES = (
    (re.compile(r"decoder/(fc1_1|fc2_1)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"decoder/(fc1_1|fc2_1)/bias$"), P(MODEL_AXIS)),
    (re.compile(r"decoder/(conv1_1|conv2_1)/kernel$"), P(MODEL_AXIS, None)),
)


def make_dp_tp_mesh(dp: int, tp: int,
                    devices: Optional[list] = None) -> Mesh:
    """2-D (batch=dp, model=tp) mesh.  The model axis should ride the
    faster ICI dimension; with jax's default device order on a slice,
    adjacent devices land in the trailing (tp) axis."""
    devices = devices if devices is not None else jax.devices()
    if dp * tp > len(devices):
        raise ValueError(
            f"dp*tp = {dp * tp} exceeds {len(devices)} devices")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (BATCH_AXIS, MODEL_AXIS))


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", k))))
    return "/".join(parts)


def spec_for_path(path) -> P:
    """PartitionSpec for one tree leaf; replicated unless a Megatron rule
    matches the path suffix."""
    s = _path_str(path)
    for pat, spec in _RULES:
        if pat.search(s):
            return spec
    return P()


def tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree mirroring ``tree``, Megatron rules applied by
    path (works for params and for optax states that mirror the param
    tree, e.g. Adam's mu/nu)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, spec_for_path(path)), tree
    )


def shard_tree(tree: Any, mesh: Mesh) -> Any:
    """device_put ``tree`` with Megatron shardings over ``mesh``."""
    return jax.device_put(tree, tree_shardings(tree, mesh))


def is_tp_mesh(mesh: Mesh) -> bool:
    return MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1
