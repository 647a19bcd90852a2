"""Data layer: on-disk loaders with reference layout, pipeline, transforms."""

import numpy as np
import pytest

from fenet.data.loader import DataLoader
from fenet.data.sample_pcl import prepare_splits
from fenet.data.shapenet import ShapeNetDataset, load_split
from fenet.data.synthetic import SyntheticShapeNet, write_synthetic_shapenet
from fenet.data.transforms import (
    ColorJitter,
    Compose,
    Normalize,
    RandomBackground,
    SaltPepperNoise,
)


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shapenet"))
    write_synthetic_shapenet(root, cats=("02691156", "03001627"),
                             models_per_cat=2)
    return root


def test_shapenet_dataset_layout_and_crop(synthetic_root):
    splits = load_split(synthetic_root + "/splits", "train_models.json")
    ds = ShapeNetDataset(
        synthetic_root + "/ShapeNetRendering/",
        synthetic_root + "/ShapeNet_pointclouds/",
        splits,
        ["02691156"],
        variety=True,
    )
    assert len(ds) == 2 * 24
    s = ds[0]
    # 137x137 source, cropped [4:-5, 4:-5] -> 128x128 (datasets_old.py:32)
    assert s["image"].shape == (128, 128, 3)
    assert s["image"].dtype == np.float32
    assert s["image"].max() > 1.5  # raw 0..255, no /255
    assert s["points"].shape == (1024, 3)
    assert "xangle" in s and "yangle" in s


def test_shapenet_uint8_wire_format_is_value_identical(synthetic_root):
    """image_dtype='uint8' (the production wire format, 4x less host->HBM
    traffic) must carry exactly the same pixel values as float32 — the
    convention is raw integer 0..255, so the cast is lossless."""
    splits = load_split(synthetic_root + "/splits", "train_models.json")
    kw = dict(models=splits, cats=["02691156"])
    ds32 = ShapeNetDataset(
        synthetic_root + "/ShapeNetRendering/",
        synthetic_root + "/ShapeNet_pointclouds/", **kw,
    )
    ds8 = ShapeNetDataset(
        synthetic_root + "/ShapeNetRendering/",
        synthetic_root + "/ShapeNet_pointclouds/", image_dtype="uint8", **kw,
    )
    a, b = ds32[3]["image"], ds8[3]["image"]
    assert b.dtype == np.uint8
    np.testing.assert_array_equal(a, b.astype(np.float32))
    with pytest.raises(ValueError):
        ShapeNetDataset(
            synthetic_root + "/ShapeNetRendering/",
            synthetic_root + "/ShapeNet_pointclouds/",
            image_dtype="uint8", transform=lambda x: x, **kw,
        )


def test_shapenet_multi_resolution(synthetic_root):
    splits = load_split(synthetic_root + "/splits", "val_models.json")
    ds = ShapeNetDataset(
        synthetic_root + "/ShapeNetRendering/",
        synthetic_root + "/ShapeNet_pointclouds/",
        splits,
        ["03001627"],
        multi_resolution=True,
        check_exists=True,
    )
    s = ds[5]
    assert s["points_128"].shape == (128, 3)
    assert s["points_256"].shape == (256, 3)


def test_dataloader_batching_and_prefetch():
    ds = SyntheticShapeNet(n_models=3, variety=True)
    dl = DataLoader(ds, batch_size=16, shuffle=True, drop_last=True, prefetch=2)
    batches = list(dl)
    assert len(batches) == len(ds) // 16 == len(dl)
    assert batches[0]["image"].shape == (16, 128, 128, 3)
    assert batches[0]["points"].shape == (16, 1024, 3)
    assert batches[0]["xangle"].shape == (16,)

    # drop_last=False covers the tail
    dl2 = DataLoader(ds, batch_size=32, drop_last=False, prefetch=0)
    total = sum(b["image"].shape[0] for b in dl2)
    assert total == len(ds)


def test_dataloader_shuffle_determinism():
    ds = SyntheticShapeNet(n_models=2)
    a = [b["image"].sum() for b in DataLoader(ds, 8, shuffle=True, seed=7)]
    b = [b["image"].sum() for b in DataLoader(ds, 8, shuffle=True, seed=7)]
    np.testing.assert_allclose(a, b)


def test_prepare_splits_fps(synthetic_root, tmp_path):
    import shutil

    pcl_root = str(tmp_path / "pcl")
    shutil.copytree(synthetic_root + "/ShapeNet_pointclouds", pcl_root)
    # remove the pre-made small clouds to force regeneration
    import glob, os

    for f in glob.glob(pcl_root + "/*/*/pointcloud_128.npy"):
        os.remove(f)
    for f in glob.glob(pcl_root + "/*/*/pointcloud_256.npy"):
        os.remove(f)
    splits = load_split(synthetic_root + "/splits", "train_models.json")
    n = prepare_splits(pcl_root + "/", splits, ["02691156"])
    assert n == 2
    c = np.load(glob.glob(pcl_root + "/02691156/*/pointcloud_128.npy")[0])
    assert c.shape == (128, 3)


def test_transforms():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.float32)
    img[:8] = 0.0  # fake background
    pipe = Compose([
        ColorJitter(rng=np.random.RandomState(1)),
        SaltPepperNoise(0.05, rng=np.random.RandomState(2)),
        RandomBackground(rng=np.random.RandomState(3)),
    ])
    out = pipe(img)
    assert out.shape == img.shape
    assert out[:8].min() >= 225  # background filled
    norm = Normalize([0.5, 0.5, 0.5], [0.5, 0.5, 0.5])(img)
    assert -1.0 <= norm.min() and norm.max() <= 1.0
