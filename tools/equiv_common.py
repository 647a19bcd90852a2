"""Shared scaffolding for the on-chip training-equivalence experiments
(tools/eps_scaling_equiv.py, tools/sinkhorn_equiv.py): synthetic batch
construction (bench.py's seed-0 / [0, 0.9)-cloud convention) and the
timed per-step training loop."""

from __future__ import annotations

import json
import time

import numpy as np


def make_batches(steps: int, batch: int, seed: int = 0):
    """``steps`` (images, points) batches + one held-out batch, fixed seed
    so every arm sees the identical data order."""
    rng = np.random.RandomState(seed)

    def one():
        return ((rng.rand(batch, 128, 128, 3) * 255).astype(np.float32),
                (rng.rand(batch, 1024, 3) * 0.9).astype(np.float32))

    return [one() for _ in range(steps)], one()


def train_arm(cfg, batches, steps_per_epoch: int, label: str):
    """Train from PRNGKey(0) init over ``batches``; returns
    (per-step losses, per-step walls, final TrainState, trainer)."""
    import jax

    from fenet.models.generator import Generator
    from fenet.parallel.mesh import make_mesh, shard_batch
    from fenet.train.trainer import Trainer, reference_lr_schedule

    mesh = make_mesh(1)
    model = Generator(num_points=1024, backbone=cfg.backbone)
    trainer = Trainer(model, cfg, mesh=mesh)
    state = trainer.init_state(
        jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32)
    )
    hist, walls = [], []
    for i, (img, pts) in enumerate(batches):
        sh = shard_batch({"i": img, "p": pts}, mesh)
        epoch = 1 + i // steps_per_epoch
        lr = reference_lr_schedule(cfg.lr, epoch)
        t0 = time.time()
        state, stats = trainer.train_step(state, sh["i"], sh["p"],
                                          epoch=epoch, lr=lr)
        losses = {k: float(v) for k, v in stats.items()}  # forces drain
        walls.append(time.time() - t0)
        hist.append(losses)
        print(json.dumps({"arm": label, "step": i,
                          "wall_s": round(walls[-1], 3), **losses}),
              flush=True)
    return hist, walls, state, trainer


def wall_sans_compile(walls):
    """Sum of per-step walls excluding the first (compile) step; a small
    floor keeps single-step runs from dividing by zero downstream."""
    return max(sum(walls[1:]), 1e-9)
