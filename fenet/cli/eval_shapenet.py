"""ShapeNet 13-category eval CLI (testnet.py equivalent), batched on device."""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from fenet.cli.common import ALL_CATS
from fenet.data.loader import DataLoader
from fenet.data.shapenet import ShapeNetDataset, load_split
from fenet.eval.runner import evaluate_dataset
from fenet.models.generator import Generator, init_variables
from fenet.train.checkpoint import load_checkpoint
from fenet.utils.logger import get_logger


def main(argv=None):
    # Join the cluster BEFORE any jax computation (no-op on a single
    # host; see fenet.parallel.distributed.initialize for the env knobs).
    from fenet.parallel.distributed import initialize

    initialize()
    parser = argparse.ArgumentParser()
    parser.add_argument("--batchSize", type=int, default=64)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--num_points", type=int, default=1024)
    parser.add_argument("--model", type=str,
                        default="./output/fenet/%s/checkpoints/")
    parser.add_argument("--splits_path", type=str, default="./data/splits/")
    parser.add_argument("--data_dir_imgs", type=str,
                        default="./data/shapenet/ShapeNetRendering/")
    parser.add_argument("--data_dir_pcl", type=str,
                        default="./data/shapenet/ShapeNet_pointclouds/")
    parser.add_argument("--backbone", type=str, default="RepVGG-A2")
    parser.add_argument("--fine_width", type=int, default=512,
                        help="decoder fine-head per-point channels")
    parser.add_argument("--mid_width", type=int, default=128,
                        help="decoder mid-head per-point channels")
    parser.add_argument("--cats", nargs="*", default=ALL_CATS)
    parser.add_argument("--no_icp", action="store_true")
    parser.add_argument("--icp_iters", type=int, default=1024)
    parser.add_argument("--icp_patience", type=int, default=32,
                        help="stop an element after this many non-improving "
                             "ICP iterations (0 = reference full budget)")
    parser.add_argument("--icp_rel_tolerance", type=float, default=None,
                        help="fp32 relative plateau exit; default couples "
                             "to --icp_patience: 1e-6 normally, 0 (OFF, "
                             "strict reference full-budget semantics) when "
                             "patience is 0 — as in record_goldens")
    parser.add_argument("--emd_iters", type=int, default=50)
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
    parser.add_argument("--deploy", action="store_true",
                        help="fold BN + RepVGG branches into single 3x3 "
                             "convs before eval (repvgg_model_convert, "
                             "…_cmlp.py:440-448; numerically equivalent, "
                             "faster forward)")
    opt = parser.parse_args(argv)
    if opt.icp_rel_tolerance is None:
        opt.icp_rel_tolerance = 0.0 if opt.icp_patience == 0 else 1e-6
    print(opt)

    gen = Generator(num_points=opt.num_points, backbone=opt.backbone,
                    fine_width=opt.fine_width, mid_width=opt.mid_width)
    val_models = load_split(opt.splits_path, "val_models.json")
    results = {}
    for cat in opt.cats:
        ckpt_dir = opt.model % cat
        logger = get_logger(os.path.join(ckpt_dir, "logging_test.log"))
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
        ds = ShapeNetDataset(
            opt.data_dir_imgs, opt.data_dir_pcl, val_models, [cat],
            opt.num_points, multi_resolution=False, check_exists=True,
            image_dtype="uint8",
        )
        from fenet.parallel.distributed import shard_for_process

        loader = DataLoader(shard_for_process(ds), opt.batchSize,
                            drop_last=False)
        cd_m, emd_m, summary = evaluate_dataset(
            eval_gen, variables, loader, category=cat, logger=logger,
            align=not opt.no_icp, icp_iterations=opt.icp_iters,
            icp_patience=opt.icp_patience,
            icp_rel_tolerance=opt.icp_rel_tolerance,
            icp_coarse_points=opt.icp_coarse_points,
            emd_iters=opt.emd_iters,
        )
        results[cat] = summary
        print(cat, json.dumps(summary))
    if results:
        mean_cd = float(np.mean([r["ChamferDistance"] for r in results.values()]))
        mean_emd = float(np.mean([r["EMD_distance"] for r in results.values()]))
        print(json.dumps({"mean_cd": mean_cd, "mean_emd": mean_emd}))
    return results


if __name__ == "__main__":
    main()
