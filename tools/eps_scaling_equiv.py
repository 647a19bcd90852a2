"""Training-equivalence + wall-time artifact for adaptive epsilon-scaling.

Runs the SAME synthetic training twice on the real chip — strict reference
auction (``emd_scale_phases=1``, the default; emd_cuda.cu:256's fixed-eps
semantics) vs adaptive scaling (``--emd_scale_phases 3 --emd_scale_thresh
0.3``) — from the same init (fixed seed) on identical data order, at the
reference's production settings (batch 128, CD+EMD eps=0.05 iters=3000,
Adam, train.py:36-46). Records per-step losses, final CD/EMD, and the
wall-time ratio to ``docs/eps_scaling_equiv.json`` — the end-to-end
evidence PARITY.md #10 cites for whether the fast mode should become the
default.

Usage: ``python tools/eps_scaling_equiv.py [--steps 24] [--batch 128]``
(15-30 min cold — two fresh train-step compiles; minutes warm).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from equiv_common import make_batches, train_arm, wall_sans_compile  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--steps_per_epoch", type=int, default=8)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "eps_scaling_equiv.json"))
    opt = parser.parse_args(argv)

    from fenet.utils.compilation_cache import enable

    enable()
    from fenet.train.config import TrainConfig

    batches, _ = make_batches(opt.steps, opt.batch)

    def arm(scale_phases, scale_thresh, label):
        cfg = TrainConfig(batch_size=opt.batch,
                          emd_scale_phases=scale_phases,
                          emd_scale_thresh=scale_thresh)
        hist, walls, _, _ = train_arm(cfg, batches, opt.steps_per_epoch,
                                      label)
        return hist, walls

    strict_hist, strict_w = arm(1, 0.0, "phases=1")
    adapt_hist, adapt_w = arm(3, 0.3, "phases=3")

    s_wall = wall_sans_compile(strict_w)
    a_wall = wall_sans_compile(adapt_w)
    final_s, final_a = strict_hist[-1], adapt_hist[-1]
    rel = {
        k: abs(final_s[k] - final_a[k]) / max(abs(final_s[k]), 1e-9)
        for k in ("chamfer_loss", "emd_loss", "total_loss")
    }
    record = {
        "settings": {
            "batch": opt.batch, "steps": opt.steps,
            "steps_per_epoch": opt.steps_per_epoch,
            "emd": "eps=0.05 iters=3000 (train.py:36-46, loss.py:23)",
            "seed": 0, "identical_data_order": True,
        },
        "strict": {"final": final_s, "wall_seconds_sans_compile":
                   round(s_wall, 2), "per_step": strict_hist},
        "adaptive": {"final": final_a, "wall_seconds_sans_compile":
                     round(a_wall, 2), "per_step": adapt_hist,
                     "flags": "--emd_scale_phases 3 --emd_scale_thresh 0.3"},
        "final_loss_rel_diff": {k: round(v, 5) for k, v in rel.items()},
        "speedup_strict_over_adaptive_wall_ratio": round(s_wall / a_wall, 3),
    }
    with open(opt.out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps({"out": opt.out,
                      "speedup": record[
                          "speedup_strict_over_adaptive_wall_ratio"],
                      "final_loss_rel_diff": record["final_loss_rel_diff"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
