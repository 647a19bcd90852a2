"""Real-ShapeNet golden recorder: the BASELINE.json 1%-parity pipeline.

Given mounted ShapeNet data and per-category checkpoints — fenet's own OR
the reference's torch ``.pth.tar`` files (testnet.py:112-136 loads one per
category) — this emits the 13-category CD/EMD golden table as JSON, ready
to diff against the reference's published per-category numbers (or against
a table produced by running the reference's testnet.py on the same
checkpoints).

Defaults are STRICT parity mode: full-budget ICP (no stall patience), the
reference eval EMD settings (eps=0.005, iters=50), metrics x100
(utils/metrics.py:46-58). Runbook:

    # reference checkpoints (torch):
    python -m fenet.cli.record_goldens \\
        --torch_model /ckpts/%s/model_best.pth.tar \\
        --data_dir_imgs .../ShapeNetRendering/ \\
        --data_dir_pcl .../ShapeNet_pointclouds/ \\
        --splits_path .../splits/ --out goldens_shapenet.json

    # fenet checkpoints:
    python -m fenet.cli.record_goldens \\
        --model ./output/fenet/%s/checkpoints/ --out goldens_shapenet.json

Categories whose checkpoint or data are missing are SKIPPED with a note
(recorded in the JSON), so partial mounts still produce a usable table.
"""

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


def _load_variables(gen: Generator, opt, cat: str, template=None):
    """Per-category variables from either checkpoint universe.

    ``template`` (the deterministic ``gen.init`` restore target) can be
    shared across categories — at real-ShapeNet widths one init is ~170M
    params on this 1-core host; neither restore path mutates it."""
    if template is None:
        sample = np.zeros((1, 128, 128, 3), np.float32)
        template = init_variables(gen, sample)
    variables = template
    if opt.torch_model:
        from fenet.models.convert import load_torch_checkpoint, merge_variables

        path = opt.torch_model % cat if "%s" in opt.torch_model \
            else opt.torch_model
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        converted = load_torch_checkpoint(path)
        return {
            "params": merge_variables(variables["params"],
                                      converted["params"]),
            "batch_stats": merge_variables(variables["batch_stats"],
                                           converted["batch_stats"]),
        }
    ckpt_dir = opt.model % cat if "%s" in opt.model else opt.model
    blob = load_checkpoint(
        os.path.join(ckpt_dir, "model_best.ckpt"),
        target={"params": variables["params"],
                "batch_stats": variables["batch_stats"]},
    )
    return {"params": blob["params"], "batch_stats": blob["batch_stats"]}


def main(argv=None):
    from fenet.parallel.distributed import initialize, shard_for_process

    initialize()
    parser = argparse.ArgumentParser()
    parser.add_argument("--batchSize", type=int, default=64)
    parser.add_argument("--num_points", type=int, default=1024)
    parser.add_argument("--model", type=str,
                        default="./output/fenet/%s/checkpoints/",
                        help="fenet checkpoint dir pattern (%%s = category)")
    parser.add_argument("--torch_model", type=str, default=None,
                        help="reference .pth.tar pattern (%%s = category); "
                             "takes precedence over --model")
    parser.add_argument("--splits_path", type=str, default="./data/splits/")
    parser.add_argument("--data_dir_imgs", type=str,
                        default="./data/shapenet/ShapeNetRendering/")
    parser.add_argument("--data_dir_pcl", type=str,
                        default="./data/shapenet/ShapeNet_pointclouds/")
    parser.add_argument("--backbone", type=str, default="RepVGG-A2")
    parser.add_argument("--fine_width", type=int, default=512)
    parser.add_argument("--mid_width", type=int, default=128)
    parser.add_argument("--cats", nargs="*", default=ALL_CATS)
    parser.add_argument("--icp_iters", type=int, default=1024)
    parser.add_argument("--icp_patience", type=int, default=0,
                        help="0 = STRICT full-budget ICP (the golden "
                             "default); 32 = the fast eval mode")
    parser.add_argument("--icp_rel_tolerance", type=float, default=None,
                        help="fp32 plateau-exit threshold; default 0.0 "
                             "(OFF) when --icp_patience is 0 so the strict "
                             "golden mode really runs the full budget, "
                             "1e-6 otherwise")
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
    parser.add_argument("--split", type=str, default="val",
                        choices=("val", "train"),
                        help="which split file to evaluate "
                             "(testnet.py evaluates val_models.json)")
    parser.add_argument("--out", type=str, default="goldens_shapenet.json")
    opt = parser.parse_args(argv)
    if opt.icp_rel_tolerance is None:
        # Strict goldens must not early-exit at all: the fp32 plateau test
        # is a documented divergence (~0.1% metric impact, PARITY.md #11)
        # and would silently leak into numbers meant to match the
        # reference's full-budget host ICP.
        opt.icp_rel_tolerance = 0.0 if opt.icp_patience == 0 else 1e-6
    print(opt)

    gen = Generator(num_points=opt.num_points, backbone=opt.backbone,
                    fine_width=opt.fine_width, mid_width=opt.mid_width)
    models = load_split(opt.splits_path, f"{opt.split}_models.json")

    table = {"settings": {
        "icp": {"iterations": opt.icp_iters, "tolerance": 1e-10,
                "rel_tolerance": opt.icp_rel_tolerance,
                "patience": opt.icp_patience,
                "coarse_points": opt.icp_coarse_points},
        "emd": {"eps": 0.005, "iters": opt.emd_iters},
        "metrics": "sqrt-EMD x100 / squared-CD x100 (utils/metrics.py)",
        "checkpoints": opt.torch_model or opt.model,
        "split": opt.split,
    }, "categories": {}}
    sample = np.zeros((1, 128, 128, 3), np.float32)
    template = init_variables(gen, sample)
    for cat in opt.cats:
        err = None
        try:
            variables = _load_variables(gen, opt, cat, template)
            ds = ShapeNetDataset(
                opt.data_dir_imgs, opt.data_dir_pcl, models, [cat],
                opt.num_points, multi_resolution=False, check_exists=True,
                image_dtype="uint8",
            )
            if not len(ds):
                raise FileNotFoundError(
                    f"no samples for {cat} under {opt.data_dir_imgs}"
                )
        except FileNotFoundError as e:
            err = str(e)
        if jax.process_count() > 1:
            # Skip decisions are filesystem-dependent and per-process;
            # evaluate_dataset is collective. Every process must agree per
            # category, or schedules diverge and the cluster hangs in a
            # collective until the watchdog kills it.
            from jax.experimental import multihost_utils

            oks = multihost_utils.process_allgather(
                np.asarray([err is None])
            )
            if not bool(np.all(oks)) and err is None:
                err = ("skipped: checkpoint/data missing on another "
                       "process (collective consistency)")
        if err is not None:
            table["categories"][cat] = {"skipped": err}
            print(cat, "SKIPPED:", err)
            continue
        loader = DataLoader(shard_for_process(ds), opt.batchSize,
                            drop_last=False)
        _, _, summary = evaluate_dataset(
            gen, variables, loader, category=cat, logger=None,
            icp_iterations=opt.icp_iters, icp_patience=opt.icp_patience,
            icp_rel_tolerance=opt.icp_rel_tolerance,
            icp_coarse_points=opt.icp_coarse_points,
            emd_iters=opt.emd_iters,
        )
        table["categories"][cat] = {
            "cd": summary["ChamferDistance"],
            "emd": summary["EMD_distance"],
            "samples": summary["samples"],
        }
        print(cat, json.dumps(table["categories"][cat]))

    done = [c for c in table["categories"].values() if "cd" in c]
    if done:
        table["mean_cd"] = float(np.mean([c["cd"] for c in done]))
        table["mean_emd"] = float(np.mean([c["emd"] for c in done]))
    table["skipped"] = sorted(
        k for k, v in table["categories"].items() if "skipped" in v
    )
    if jax.process_index() == 0:  # one writer; peers raced on shared fs
        with open(opt.out, "w") as f:
            json.dump(table, f, indent=1)
    print(json.dumps({"out": opt.out,
                      "recorded": len(done),
                      "skipped": len(table["skipped"]),
                      "mean_cd": table.get("mean_cd"),
                      "mean_emd": table.get("mean_emd")}))
    return table


if __name__ == "__main__":
    main()
