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
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(scale_phases, scale_thresh, batches, batch, epochs_steps):
    import jax

    from fenet.models.generator import Generator
    from fenet.parallel.mesh import make_mesh, shard_batch
    from fenet.train.config import TrainConfig
    from fenet.train.trainer import Trainer, reference_lr_schedule

    cfg = TrainConfig(batch_size=batch, emd_scale_phases=scale_phases,
                      emd_scale_thresh=scale_thresh)
    mesh = make_mesh(1)
    model = Generator(num_points=1024, backbone=cfg.backbone)
    trainer = Trainer(model, cfg, mesh=mesh)
    state = trainer.init_state(
        jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32)
    )
    hist, step_walls = [], []
    for i, (img, pts) in enumerate(batches):
        sh = shard_batch({"i": img, "p": pts}, mesh)
        epoch = 1 + i // epochs_steps
        lr = reference_lr_schedule(cfg.lr, epoch)
        t0 = time.time()
        state, stats = trainer.train_step(state, sh["i"], sh["p"],
                                          epoch=epoch, lr=lr)
        losses = {k: float(v) for k, v in stats.items()}  # forces drain
        step_walls.append(time.time() - t0)
        hist.append(losses)
        print(json.dumps({"arm": f"phases={scale_phases}", "step": i,
                          "wall_s": round(step_walls[-1], 3), **losses}),
              flush=True)
    return hist, step_walls


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

    # Identical data order for both arms (fixed seed; synthetic clouds in
    # the EMD contract's [0,1] range like bench.py's train section).
    rng = np.random.RandomState(0)
    batches = [
        ((rng.rand(opt.batch, 128, 128, 3) * 255).astype(np.float32),
         (rng.rand(opt.batch, 1024, 3) * 0.9).astype(np.float32))
        for _ in range(opt.steps)
    ]

    strict_hist, strict_w = run_arm(1, 0.0, batches, opt.batch,
                                    opt.steps_per_epoch)
    adapt_hist, adapt_w = run_arm(3, 0.3, batches, opt.batch,
                                  opt.steps_per_epoch)

    # Exclude each arm's first step (compile) from the wall comparison.
    s_wall, a_wall = sum(strict_w[1:]), sum(adapt_w[1:])
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
