"""Grad-CAM explainability CLI (models/heatmap.py driver, :129-141).

Loads a trained category checkpoint, runs Grad-CAM over the backbone
feature map for validation samples, and writes heatmap-overlay PNGs.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from fenet.data.loader import DataLoader
from fenet.data.shapenet import ShapeNetDataset, load_split
from fenet.models.generator import Generator, init_variables
from fenet.train.checkpoint import load_checkpoint
from fenet.viz.gradcam import save_cam_overlay


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--category", type=str, required=True)
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
    parser.add_argument("--out_dir", type=str, default="./heatmaps/")
    parser.add_argument("--n_samples", type=int, default=4)
    parser.add_argument("--alpha", type=float, default=0.4)
    parser.add_argument("--layer", type=str, default=None,
                        help="backbone layer for the CAM: a block name "
                             "('stage2_3'), a stage prefix ('stage2' = "
                             "that stage's last block), or omitted for "
                             "the final feature map (the draw_CAM "
                             "chosen-module semantics, heatmap.py:43-80)")
    opt = parser.parse_args(argv)

    gen = Generator(num_points=opt.num_points, backbone=opt.backbone,
                    fine_width=opt.fine_width, mid_width=opt.mid_width)
    sample = np.zeros((1, 128, 128, 3), np.float32)
    variables = init_variables(gen, sample)
    blob = load_checkpoint(
        os.path.join(opt.model % opt.category, "model_best.ckpt"),
        target={"params": variables["params"],
                "batch_stats": variables["batch_stats"]},
    )
    variables = {"params": blob["params"], "batch_stats": blob["batch_stats"]}

    val_models = load_split(opt.splits_path, "val_models.json")
    ds = ShapeNetDataset(opt.data_dir_imgs, opt.data_dir_pcl, val_models,
                         [opt.category], opt.num_points, check_exists=True)
    loader = DataLoader(ds, batch_size=1)

    os.makedirs(opt.out_dir, exist_ok=True)
    for i, batch in enumerate(loader):
        if i >= opt.n_samples:
            break
        suffix = f"_{opt.layer}" if opt.layer else ""
        path = os.path.join(
            opt.out_dir, f"{opt.category}_{i:03d}_cam{suffix}.png"
        )
        save_cam_overlay(gen, variables, batch["image"], path,
                         alpha=opt.alpha, layer=opt.layer)
    n = min(opt.n_samples, len(ds))
    print(f"wrote {n} CAM overlays to {opt.out_dir}")


if __name__ == "__main__":
    main()
