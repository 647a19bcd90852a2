"""Finetune CLI with projection loss (finetune.py equivalent):
10 epochs at lr 5e-5, total = 100*BCE + 100*CD + 100*EMD, resuming from the
best checkpoint."""

from __future__ import annotations

import argparse

from fenet.cli.common import DEFAULT_TRAIN_CATS, add_common_args, config_from_args
from fenet.train.driver import train_net


def main(argv=None):
    # Join the cluster BEFORE any jax computation (no-op on a single
    # host; see fenet.parallel.distributed.initialize for the env knobs).
    from fenet.parallel.distributed import initialize

    initialize()
    parser = add_common_args(argparse.ArgumentParser())
    parser.add_argument("--cats", nargs="*", default=None,
                        help="category ids to finetune (default: bench set)")
    parser.add_argument("--grid_h", type=int, default=64)
    parser.add_argument("--grid_w", type=int, default=64)
    parser.add_argument("--SIGMA_SQ", type=float, default=2.0)
    parser.add_argument("--OUTPUT_PCL_SIZE", type=int, default=1024)
    parser.add_argument("--proj_squash", action="store_true",
                        help="apply the CAPNet tanh composition to the splat "
                             "silhouettes so the BCE term is bounded below "
                             "(the reference's raw sum is not a probability; "
                             "it never noticed — its projection is detached)")
    parser.set_defaults(nepoch=10, lr=5e-5, resume=True)
    opt = parser.parse_args(argv)
    print(opt)

    cats = opt.cats or ([opt.category] if opt.category else DEFAULT_TRAIN_CATS)
    for cat in cats:
        cfg = config_from_args(opt)
        cfg.category = cat
        cfg.grid_h, cfg.grid_w = opt.grid_h, opt.grid_w
        cfg.sigma_sq = opt.SIGMA_SQ
        cfg.output_pcl_size = opt.OUTPUT_PCL_SIZE
        cfg.proj_squash = opt.proj_squash
        train_net(cat, cfg, loss_mode="finetune")


if __name__ == "__main__":
    main()
