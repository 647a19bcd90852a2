"""Visualization CLI (shapenet_img.py / shapenet_img_edge.py /
save_pix3d_img.py equivalent): render GT + predicted 128/256/1024-point
clouds to PNG comparisons for a trained category."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from fenet.data.loader import DataLoader
from fenet.data.shapenet import ShapeNetDataset, load_split
from fenet.models.generator import Generator, init_variables
from fenet.train.checkpoint import load_checkpoint
from fenet.viz.render import render_clouds


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
    parser.add_argument("--out_dir", type=str, default="./renders/")
    parser.add_argument("--n_samples", type=int, default=8)
    parser.add_argument("--deploy", action="store_true",
                        help="fold BN + RepVGG branches before inference "
                             "(numerically equivalent, faster forward)")
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
    if opt.deploy:
        from fenet.models.generator import to_deploy

        gen, variables = to_deploy(gen, variables)

    val_models = load_split(opt.splits_path, "val_models.json")
    ds = ShapeNetDataset(opt.data_dir_imgs, opt.data_dir_pcl, val_models,
                         [opt.category], opt.num_points, check_exists=True)
    loader = DataLoader(ds, batch_size=1)

    @jax.jit
    def forward(variables, images):
        return gen.apply(variables, images, train=False)

    os.makedirs(opt.out_dir, exist_ok=True)
    for i, batch in enumerate(loader):
        if i >= opt.n_samples:
            break
        pc1, pc2, pc3 = forward(variables, batch["image"])
        render_clouds(
            {
                "gt": batch["points"][0],
                "pred_128": np.asarray(pc1)[0],
                "pred_256": np.asarray(pc2)[0],
                f"pred_{opt.num_points}": np.asarray(pc3)[0],
            },
            path=os.path.join(opt.out_dir, f"{opt.category}_{i:03d}.png"),
            image=batch["image"][0],
        )
    print(f"wrote {min(opt.n_samples, len(ds))} renders to {opt.out_dir}")


if __name__ == "__main__":
    main()
