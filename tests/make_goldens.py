"""Generate golden metric values from the ACTUAL reference code.

Runs the reference's own pure-torch oracles (loss/loss_.py:66-140) on fixed
seeded clouds and records the results into ``tests/goldens/metric_goldens.npz``
(checked in). The parity tests assert fenet's ops reproduce these within the
BASELINE.json 1% bar (in practice they agree to float tolerance — a failure
means a metric rule drifted from the reference).

EMD: the reference's CUDA auction cannot run here, so the golden is the
EXACT optimal assignment cost (scipy linear_sum_assignment on the same
float64 pairwise matrix the reference builds at loss_.py:66-77); the test
asserts the fenet auction's eps-suboptimality stays within its recorded
round-2 margin.

Run from the repo root:  python tests/make_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF_LOSS_DIR = "/root/reference/loss"
OUT = os.path.join(os.path.dirname(__file__), "goldens", "metric_goldens.npz")

# Fixture clouds: same generator the tests use. Coords in [0, 1) per the EMD
# kernel contract (metric/emd/README.md:19).
SEED = 20260816
SHAPE = (4, 1024, 3)


def _import_reference_loss():
    """Import /root/reference/loss/loss_.py with its unavailable deps stubbed
    (geomloss isn't installed; dist_chamfer_3D would JIT-build CUDA)."""
    for name in ("geomloss", "dist_chamfer_3D"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.SamplesLoss = None
            stub.chamfer_3DDist = None
            sys.modules[name] = stub
    sys.path.insert(0, REF_LOSS_DIR)
    try:
        import importlib

        return importlib.import_module("loss_")
    finally:
        sys.path.remove(REF_LOSS_DIR)


def main() -> None:
    import torch
    from scipy.optimize import linear_sum_assignment

    loss_ = _import_reference_loss()

    rng = np.random.RandomState(SEED)
    a = rng.rand(*SHAPE).astype(np.float32)
    b = rng.rand(*SHAPE).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)

    # Chamfer oracle: loss_.py:79-91 (float64 matmul pairwise, per-direction
    # squared-NN means). Also the loss facade's CD = mean(d1)+mean(d2)
    # (loss/loss.py:30-37) and the x100 eval convention (metrics.py:55-60).
    d1, d2, i1, i2 = loss_.distChamfer(ta, tb)
    cd_per_sample = (d1.mean(dim=1) + d2.mean(dim=1)).numpy()

    # F-score oracle at the reference threshold 1e-4 (loss_.py:122-140).
    with torch.no_grad():
        fs, prec1, prec2 = loss_.fscore(ta, tb)

    # Exact optimal EMD per sample on the reference's own float64 pairwise
    # matrix (upper bound of auction quality at any eps).
    P = loss_.batched_pairwise_dist(ta, tb).numpy()  # (B, N, N) squared
    emd_opt_sqrt_mean = np.empty(SHAPE[0], np.float64)
    for k in range(SHAPE[0]):
        r, c = linear_sum_assignment(np.sqrt(np.maximum(P[k], 0.0)))
        emd_opt_sqrt_mean[k] = np.sqrt(np.maximum(P[k][r, c], 0.0)).mean()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(
        OUT,
        seed=SEED,
        cd_per_sample=cd_per_sample,
        dist1_mean=d1.mean(dim=1).numpy(),
        dist2_mean=d2.mean(dim=1).numpy(),
        idx1_head=i1[:, :64].numpy(),
        idx2_head=i2[:, :64].numpy(),
        fscore=float(fs),
        precision_1=float(prec1),
        precision_2=float(prec2),
        emd_optimal_sqrt_mean=emd_opt_sqrt_mean,
    )
    print("wrote", OUT)
    print("cd_per_sample:", cd_per_sample)
    print("fscore:", float(fs))
    print("emd_optimal_sqrt_mean:", emd_opt_sqrt_mean)


if __name__ == "__main__":
    main()
