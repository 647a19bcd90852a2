"""Metric registry with best-checkpoint comparison semantics.

Rebuild of utils/metrics.py:11-109: EMD (eval settings eps=0.005, iters=50,
sqrt-mean x100) and Chamfer (mean+mean, x100), lower-is-better, init 32767;
``Metrics`` value objects with ``better_than`` drive best-checkpoint selection
(train.py:216).

Unlike the reference (one device round-trip per sample at batch=1), the
jitted :func:`eval_metrics` computes both metrics for a whole batch on device
in one call.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp

from fenet.ops.chamfer import chamfer_distance
from fenet.ops.emd import earth_mover_distance

EVAL_EMD_EPS = 0.005
EVAL_EMD_ITERS = 50


@functools.partial(jax.jit, static_argnames=("emd_eps", "emd_iters"))
def eval_metrics(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    emd_eps: float = EVAL_EMD_EPS,
    emd_iters: int = EVAL_EMD_ITERS,
) -> Dict[str, jnp.ndarray]:
    """Per-batch mean EMD and Chamfer metrics, both x100 (metrics.py:49-60)."""
    emd_sq, _ = earth_mover_distance(pred, gt, emd_eps, emd_iters)
    emd = jnp.sqrt(emd_sq).mean() * 100.0
    d1, d2, _, _ = chamfer_distance(pred, gt)
    cd = (jnp.mean(d1) + jnp.mean(d2)) * 100.0
    return {"EMD_distance": emd, "ChamferDistance": cd}


class Metrics:
    """Value object over the metric registry (utils/metrics.py:62-109)."""

    ITEMS = [
        {"name": "EMD_distance", "enabled": True,
         "is_greater_better": False, "init_value": 32767},
        {"name": "ChamferDistance", "enabled": True,
         "is_greater_better": False, "init_value": 32767},
    ]

    @classmethod
    def items(cls) -> List[dict]:
        return [i for i in cls.ITEMS if i["enabled"]]

    @classmethod
    def names(cls) -> List[str]:
        return [i["name"] for i in cls.items()]

    @classmethod
    def get(cls, pred, gt) -> List[float]:
        vals = eval_metrics(jnp.asarray(pred), jnp.asarray(gt))
        return [float(vals[n]) for n in cls.names()]

    def __init__(self, metric_name: str, values):
        self._items = Metrics.items()
        self._values = [item["init_value"] for item in self._items]
        self.metric_name = metric_name
        if isinstance(values, list):
            self._values = list(values)
        elif isinstance(values, dict):
            index = {item["name"]: i for i, item in enumerate(self._items)}
            for k, v in values.items():
                if k in index:
                    self._values[index[k]] = v
        else:
            raise TypeError(f"Unsupported value type: {type(values)}")

    def state_dict(self) -> Dict[str, float]:
        return {
            item["name"]: value
            for item, value in zip(self._items, self._values)
        }

    def __repr__(self):
        return str(self.state_dict())

    def better_than(self, other: "Metrics | None") -> bool:
        if other is None:
            return True
        idx = next(
            i for i, item in enumerate(self._items)
            if item["name"] == self.metric_name
        )
        if self._items[idx]["is_greater_better"]:
            return self._values[idx] > other._values[idx]
        return self._values[idx] < other._values[idx]
