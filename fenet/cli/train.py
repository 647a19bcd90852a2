"""Training CLI: ``python -m fenet.cli.train`` (train.py equivalent)."""

from __future__ import annotations

import argparse
import time

from fenet.cli.common import (
    DEFAULT_TRAIN_CATS,
    add_common_args,
    config_from_args,
)
from fenet.train.driver import train_net


def main(argv=None):
    # Join the cluster BEFORE any jax computation (no-op on a single
    # host; see fenet.parallel.distributed.initialize for the env knobs).
    from fenet.parallel.distributed import initialize

    initialize()
    parser = add_common_args(argparse.ArgumentParser())
    parser.add_argument("--cats", nargs="*", default=None,
                        help="category ids to train (default: bench set)")
    opt = parser.parse_args(argv)
    print(opt)

    cats = opt.cats or ([opt.category] if opt.category else DEFAULT_TRAIN_CATS)
    start = time.time()
    for cat in cats:
        cfg = config_from_args(opt)
        cfg.category = cat
        t0 = time.time()
        train_net(cat, cfg)
        print(
            "cat: %s  this category train time: %f h"
            % (cat, (time.time() - t0) / 3600)
        )
    print("all categories run time :%f h" % ((time.time() - start) / 3600))


if __name__ == "__main__":
    main()
