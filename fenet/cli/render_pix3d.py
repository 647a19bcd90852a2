"""Pix3D visualization CLI (save_pix3d_img.py equivalent).

Renders GT-vs-prediction point-cloud pairs for real Pix3D images using the
trained ShapeNet category checkpoints (chair/sofa/table mapping,
save_pix3d_img.py:30-49): for each sample, ``{name}_gt.png`` and
``{name}_pr.png`` in the reference's fixed-frame style (:101-126 — red
points, +-0.45 axes, azim=-45 elev=-165, (y, z, x) axis order).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from fenet.cli.eval_pix3d import PIX3D_TO_SHAPENET
from fenet.data.loader import DataLoader
from fenet.data.pix3d import Pix3DDataset
from fenet.models.generator import Generator, init_variables
from fenet.train.checkpoint import load_checkpoint
from fenet.viz.render import save_pix3d_cloud_png


def main(argv=None):
    parser = argparse.ArgumentParser()
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
    parser.add_argument("--out_dir", type=str, default="./pix3d_renders/")
    parser.add_argument("--n_samples", type=int, default=8,
                        help="max renders per category (0 = all)")
    parser.add_argument("--scale", type=float, default=0.45)
    parser.add_argument("--azim", type=float, default=-45.0)
    parser.add_argument("--elev", type=float, default=-165.0)
    opt = parser.parse_args(argv)
    print(opt)

    gen = Generator(num_points=opt.num_points, backbone=opt.backbone,
                    fine_width=opt.fine_width, mid_width=opt.mid_width)

    @jax.jit
    def forward(variables, images):
        _, _, pc3 = gen.apply(variables, images, train=False)
        return pc3

    written = {}
    for cat in opt.cats:
        ckpt_dir = opt.model % PIX3D_TO_SHAPENET[cat]
        sample = np.zeros((1, 128, 128, 3), np.float32)
        variables = init_variables(gen, sample)
        blob = load_checkpoint(
            os.path.join(ckpt_dir, "model_best.ckpt"),
            target={"params": variables["params"],
                    "batch_stats": variables["batch_stats"]},
        )
        variables = {"params": blob["params"],
                     "batch_stats": blob["batch_stats"]}
        ds = Pix3DDataset(opt.data_dir, category=cat,
                          num_points=opt.num_points, save=True)
        loader = DataLoader(ds, batch_size=1)
        out_dir = os.path.join(opt.out_dir, cat)
        os.makedirs(out_dir, exist_ok=True)
        count = 0
        for batch in loader:
            if opt.n_samples and count >= opt.n_samples:
                break
            name = batch["name"][0]
            gt_path = os.path.join(out_dir, f"{name}_gt.png")
            pr_path = os.path.join(out_dir, f"{name}_pr.png")
            # save_pix3d_img.py:87 skip-exists; require BOTH files so a run
            # interrupted between the two saves reproduces the missing one.
            if os.path.exists(gt_path) and os.path.exists(pr_path):
                continue
            pred = np.asarray(forward(variables, batch["image"]))[0]
            style = dict(scale=opt.scale, azim=opt.azim, elev=opt.elev)
            save_pix3d_cloud_png(batch["points"][0], gt_path, **style)
            save_pix3d_cloud_png(pred, pr_path, **style)
            count += 1
        written[cat] = count
        print(f"{cat}: wrote {count} GT/pred pairs to {out_dir}")
    return written


if __name__ == "__main__":
    main()
