"""On-chip A/B microbench for the EMD auction kernel at train settings.

Times ``_emd_pallas`` forward calls (eps=0.05, iters=3000 — loss/loss.py:23)
in the two regimes that bracket training (docs/DESIGN.md §1):

- ``war``     : clustered prediction vs uniform gt — the early-training
                price-war regime where a handful of bidders fight over a few
                nearby columns and the auction runs its full iteration budget
                with ~one live chunk per iteration (the tail this A/B is for);
- ``overlap`` : independent uniform clouds — heavy competition everywhere,
                every chunk live, converges in relatively few iterations.

Run BEFORE and AFTER a kernel change (same shapes, same seeds) and compare
ms/call. A cheap correctness oracle (assignment validity + near-bijectivity
+ gather consistency) runs on every timed output so a perf change that
breaks the auction fails here rather than in the full suite.

Usage: python tools/emd_tail_ab.py [--batch 8] [--n 1024] [--reps 3]
                                   [--iters 3000] [--label before]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_regime(regime: str, batch: int, n: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    gt = (rng.rand(batch, n, 3) * 0.9).astype(np.float32)
    if regime == "war":
        pred = (0.45 + rng.randn(batch, n, 3) * 0.01).astype(np.float32)
    elif regime == "overlap":
        pred = (rng.rand(batch, n, 3) * 0.9).astype(np.float32)
    else:
        raise ValueError(regime)
    return pred, gt


def check_outputs(x, y, dist, ass, label):
    """Validity oracle (tpu_smoke.py's): gather-consistency of distances and
    near-bijectivity of the assignment."""
    import jax.numpy as jnp

    b, n = ass.shape
    gathered = jnp.take_along_axis(y, ass[..., None], axis=1)
    gerr = float(jnp.max(jnp.abs(jnp.sum((x - gathered) ** 2, -1) - dist)))
    uniq = min(
        len(np.unique(np.asarray(ass[i]))) for i in range(b)
    )
    assert gerr < 1e-4, f"{label}: gather_err {gerr}"
    assert uniq >= int(0.93 * n), f"{label}: min_unique {uniq} / {n}"
    return {"gather_err": gerr, "min_unique": uniq}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--eps", type=float, default=0.05)
    p.add_argument("--label", default="run")
    p.add_argument("--regimes", default="war,overlap")
    opt = p.parse_args()

    from fenet.utils.compilation_cache import enable

    enable()

    import jax
    import jax.numpy as jnp

    from fenet.ops.emd import _emd_pallas

    out = {"label": opt.label, "batch": opt.batch, "n": opt.n,
           "iters": opt.iters, "eps": opt.eps,
           "device": str(jax.devices()[0].device_kind)}
    for regime in opt.regimes.split(","):
        pred, gt = make_regime(regime, opt.batch, opt.n)
        x, y = jnp.asarray(pred), jnp.asarray(gt)
        dist, ass = _emd_pallas(x, y, opt.eps, opt.iters)  # compile + warm
        oracle = check_outputs(x, y, dist, ass, regime)
        walls = []
        for _ in range(opt.reps):
            t0 = time.time()
            dist, ass = _emd_pallas(x, y, opt.eps, opt.iters)
            float(jnp.sum(dist))  # value fetch: the only reliable sync here
            walls.append(time.time() - t0)
        out[regime] = {
            "ms_per_call": round(1e3 * min(walls), 2),
            "walls_ms": [round(1e3 * w, 2) for w in walls],
            "mean_dist": round(float(jnp.mean(dist)), 6),
            **{k: (round(v, 8) if isinstance(v, float) else v)
               for k, v in oracle.items()},
        }
        print(json.dumps({regime: out[regime]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
