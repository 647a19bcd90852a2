"""Pix3D generalization eval CLI (test_pix.py equivalent).

Maps Pix3D's chair/sofa/table to their ShapeNet category checkpoints
(test_pix.py:107-126) and evaluates with ICP-aligned metrics on masked real
images. The broken older variant (test_pix3d.py, SURVEY.md §2 P25) is
subsumed by this driver.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from fenet.data.loader import DataLoader
from fenet.data.pix3d import Pix3DDataset
from fenet.eval.runner import evaluate_dataset
from fenet.models.generator import Generator, init_variables
from fenet.train.checkpoint import load_checkpoint
from fenet.utils.logger import get_logger

# Pix3D category -> ShapeNet checkpoint id (test_pix.py:107-126).
PIX3D_TO_SHAPENET = {
    "chair": "03001627",
    "sofa": "04256520",
    "table": "04379243",
}


def main(argv=None):
    # Join the cluster BEFORE any jax computation (no-op on a single
    # host; see fenet.parallel.distributed.initialize for the env knobs).
    from fenet.parallel.distributed import initialize

    initialize()
    parser = argparse.ArgumentParser()
    parser.add_argument("--batchSize", type=int, default=32)
    parser.add_argument("--num_points", type=int, default=1024)
    parser.add_argument("--model", type=str,
                        default="./output/fenet/%s/checkpoints/")
    parser.add_argument("--data_dir", type=str, default="./data/pix3d/")
    parser.add_argument("--backbone", type=str, default="RepVGG-A2")
    parser.add_argument("--fine_width", type=int, default=512,
                        help="decoder fine-head per-point channels")
    parser.add_argument("--mid_width", type=int, default=128,
                        help="decoder mid-head per-point channels")
    parser.add_argument("--cats", nargs="*",
                        default=["sofa", "table", "chair"])
    parser.add_argument("--icp_iters", type=int, default=1024)
    parser.add_argument("--icp_patience", type=int, default=32,
                        help="stop an element after this many non-improving "
                             "ICP iterations (0 = reference full budget)")
    parser.add_argument("--icp_rel_tolerance", type=float, default=None,
                        help="fp32 relative plateau exit; default couples "
                             "to --icp_patience: 1e-6 normally, 0 (OFF, "
                             "strict reference full-budget semantics) when "
                             "patience is 0 — as in record_goldens")
    parser.add_argument("--icp_coarse_points", type=int, default=0,
                        help="coarse-to-fine ICP warm start: phase-1 ICP on "
                             "this many stride-subsampled points, then "
                             "full-res refine to the same thresholds. OFF "
                             "(0) by default: measured on v5e eval batches "
                             "only 1.09x (the batch-synchronized loop is "
                             "paced by its hardest element) at ~1e-2 "
                             "metric shift on ill-posed alignments; exact "
                             "to 2e-4 on well-posed ones "
                             "(tests/test_geometry.py)")
    parser.add_argument("--emd_iters", type=int, default=50)
    parser.add_argument("--deploy", action="store_true",
                        help="fold BN + RepVGG branches before eval "
                             "(numerically equivalent, faster forward)")
    opt = parser.parse_args(argv)
    if opt.icp_rel_tolerance is None:
        opt.icp_rel_tolerance = 0.0 if opt.icp_patience == 0 else 1e-6
    print(opt)

    gen = Generator(num_points=opt.num_points, backbone=opt.backbone,
                    fine_width=opt.fine_width, mid_width=opt.mid_width)
    results = {}
    for cat in opt.cats:
        ckpt_dir = opt.model % PIX3D_TO_SHAPENET[cat]
        logger = get_logger(os.path.join(ckpt_dir, "logging_pix3d.log"))
        sample = np.zeros((1, 128, 128, 3), np.float32)
        variables = init_variables(gen, sample)
        blob = load_checkpoint(
            os.path.join(ckpt_dir, "model_best.ckpt"),
            target={"params": variables["params"],
                    "batch_stats": variables["batch_stats"]},
        )
        variables = {"params": blob["params"],
                     "batch_stats": blob["batch_stats"]}
        eval_gen = gen
        if opt.deploy:
            from fenet.models.generator import to_deploy

            eval_gen, variables = to_deploy(gen, variables)
        ds = Pix3DDataset(opt.data_dir, category=cat,
                          num_points=opt.num_points)
        from fenet.parallel.distributed import shard_for_process

        loader = DataLoader(shard_for_process(ds), opt.batchSize,
                            drop_last=False)
        _, _, summary = evaluate_dataset(
            eval_gen, variables, loader, category=cat, logger=logger,
            icp_iterations=opt.icp_iters, icp_patience=opt.icp_patience,
            icp_rel_tolerance=opt.icp_rel_tolerance,
            icp_coarse_points=opt.icp_coarse_points,
            emd_iters=opt.emd_iters,
        )
        results[cat] = summary
        print(cat, json.dumps(summary))
    return results


if __name__ == "__main__":
    main()
