"""Shared argparse plumbing with the reference drivers' flag names."""

from __future__ import annotations

import argparse

from fenet.train.config import TrainConfig


def add_common_args(parser: argparse.ArgumentParser):
    """The train.py:34-52 flag set, names preserved."""
    parser.add_argument("--category", type=str, default="", help="category")
    parser.add_argument("--batchSize", type=int, default=128,
                        help="input batch size")
    parser.add_argument("--momentum", type=float, default=0.9, metavar="M")
    parser.add_argument("--workers", type=int, default=0,
                        help="number of data loading workers")
    parser.add_argument("--nepoch", type=int, default=50)
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--lr", type=float, default=0.0005)
    parser.add_argument("--resume", type=bool, default=False)
    parser.add_argument("--lambda_cd", type=float, default=100.0)
    parser.add_argument("--lambda_emd", type=float, default=100.0)
    parser.add_argument("--train_save_freq", type=int, default=20)
    parser.add_argument("--num_points", type=int, default=1024,
                        help="number of points, [1024, 2048]")
    parser.add_argument("--dir_path", type=str, default="./output/fenet/")
    parser.add_argument("--splits_path", type=str, default="./data/splits/")
    parser.add_argument("--data_dir_imgs", type=str,
                        default="./data/shapenet/ShapeNetRendering/")
    parser.add_argument("--data_dir_pcl", type=str,
                        default="./data/shapenet/ShapeNet_pointclouds/")
    # fenet extensions
    parser.add_argument("--backbone", type=str, default="RepVGG-A2")
    parser.add_argument("--pretrained_backbone", type=str, default=None)
    parser.add_argument("--fine_width", type=int, default=512,
                        help="decoder fine-head per-point channels "
                             "(reference: 512)")
    parser.add_argument("--mid_width", type=int, default=128,
                        help="decoder mid-head per-point channels "
                             "(reference: 128)")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="devices in the batch mesh axis")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help=">1 adds a 'model' mesh axis with Megatron "
                             "column/row sharding of the decoder heads "
                             "(fenet.parallel.tp); mesh = (data_parallel, "
                             "model_parallel)")
    parser.add_argument("--emd_iters", type=int, default=3000)
    parser.add_argument("--emd_eps", type=float, default=0.05)
    parser.add_argument("--emd_scale_phases", type=int, default=1,
                        help=">1 enables epsilon-scaling auction phases "
                             "(opt-in speedup; 1 = strict reference mode, "
                             "the default). Recommended fast mode: 3")
    parser.add_argument("--emd_scale_thresh", type=float, default=0.3,
                        help=">0 gates the scaling phases on the NN-"
                             "competition fraction (adaptive scaling; "
                             "0.3 separates the regimes, 0 = always on)")
    parser.add_argument("--emd_impl", type=str, default="auction",
                        choices=("auction", "sinkhorn"),
                        help="training EMD: 'auction' (reference "
                             "semantics, default) or 'sinkhorn' — "
                             "entropic OT with the same detached-plan "
                             "gradient rule, a fixed-iteration dense "
                             "alternative (opt-in)")
    parser.add_argument("--sinkhorn_blur", type=float, default=0.01,
                        help="sinkhorn FINAL entropic eps = blur^2 (the "
                             "loop anneals down to it)")
    parser.add_argument("--sinkhorn_iters", type=int, default=300)
    parser.add_argument("--sync_bn", type=int, default=1,
                        help="1 (default): on dp>1 meshes, BatchNorm "
                             "normalizes with GLOBAL batch statistics "
                             "(the reference's single-GPU semantics); "
                             "0: per-replica BN (torch-DDP style)")
    parser.add_argument("--validate_epochs", type=int, nargs="*",
                        default=[10, 30, 50],
                        help="epochs at which to validate + checkpoint "
                             "(reference: 10 30 50)")
    parser.add_argument("--ckpt_format", type=str, default="flax",
                        choices=("flax", "orbax"),
                        help="checkpoint container: flax msgpack file "
                             "(default) or orbax directory; loading "
                             "auto-detects either")
    return parser


def config_from_args(opt) -> TrainConfig:
    return TrainConfig(
        category=opt.category,
        batch_size=opt.batchSize,
        workers=opt.workers,
        nepoch=opt.nepoch,
        start_epoch=opt.start_epoch,
        lr=opt.lr,
        momentum=opt.momentum,
        resume=opt.resume,
        lambda_cd=opt.lambda_cd,
        lambda_emd=opt.lambda_emd,
        train_save_freq=opt.train_save_freq,
        num_points=opt.num_points,
        dir_path=opt.dir_path,
        splits_path=opt.splits_path,
        data_dir_imgs=opt.data_dir_imgs,
        data_dir_pcl=opt.data_dir_pcl,
        backbone=opt.backbone,
        pretrained_backbone=opt.pretrained_backbone,
        fine_width=getattr(opt, "fine_width", 512),
        mid_width=getattr(opt, "mid_width", 128),
        data_parallel=opt.data_parallel,
        model_parallel=opt.model_parallel,
        emd_eps=opt.emd_eps,
        emd_iters=opt.emd_iters,
        emd_scale_phases=opt.emd_scale_phases,
        emd_scale_thresh=opt.emd_scale_thresh,
        emd_impl=getattr(opt, "emd_impl", "auction"),
        sinkhorn_blur=getattr(opt, "sinkhorn_blur", 0.01),
        sinkhorn_iters=getattr(opt, "sinkhorn_iters", 300),
        sync_bn=bool(getattr(opt, "sync_bn", 1)),
        validate_epochs=tuple(opt.validate_epochs),
        ckpt_format=getattr(opt, "ckpt_format", "flax"),
    )


# train.py:265-268's category list + the full 13 used by testnet.py:112.
DEFAULT_TRAIN_CATS = ["02828884"]
ALL_CATS = [
    "02691156", "02828884", "02933112", "02958343", "03636649", "03211117",
    "04090263", "03001627", "04530566", "04379243", "03691459", "04401088",
    "04256520",
]
