"""Data-prep CLI (utils/datasets_sample_pcl.py driver equivalent): generate
pointcloud_128/256.npy for every model in the splits via FPS."""

from __future__ import annotations

import argparse

from fenet.data.sample_pcl import prepare_splits
from fenet.data.shapenet import load_split


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--splits_path", type=str, default="./data/splits/")
    parser.add_argument("--data_dir_pcl", type=str,
                        default="./data/shapenet/ShapeNet_pointclouds/")
    parser.add_argument("--num_points", type=int, default=1024)
    parser.add_argument("--splits", nargs="*",
                        default=["train_models.json", "val_models.json"])
    parser.add_argument("--cats", nargs="*", default=None)
    parser.add_argument("--overwrite", action="store_true")
    opt = parser.parse_args(argv)

    total = 0
    for split in opt.splits:
        models = load_split(opt.splits_path, split)
        cats = opt.cats or list(models)
        total += prepare_splits(
            opt.data_dir_pcl, models, cats, opt.num_points,
            overwrite=opt.overwrite,
        )
    print(f"wrote FPS clouds for {total} models")


if __name__ == "__main__":
    main()
