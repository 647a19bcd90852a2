"""Pix3D dataset semantics + render driver (datasets_old.py:57-144,
save_pix3d_img.py:75-133) on a synthetic Pix3D-layout tree."""

import json
import os

import numpy as np
import pytest

from fenet.data.pix3d import HEIGHT, PAD, WIDTH, Pix3DDataset
from fenet.data.synthetic import write_synthetic_pix3d


@pytest.fixture(scope="module")
def pix3d_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pix3d"))
    write_synthetic_pix3d(root, cats=("chair", "sofa"), samples_per_cat=2)
    return root


def test_pix3d_dataset_filtering_and_shapes(pix3d_root):
    ds = Pix3DDataset(pix3d_root, category="chair", num_points=1024)
    assert len(ds) == 2  # sofa entries filtered out
    sample = ds[0]
    assert sample["image"].shape == (HEIGHT, WIDTH, 3)
    assert sample["image"].dtype == np.float32
    assert sample["points"].shape == (1024, 3)
    # mask multiplies outside-bbox pixels to zero before the crop; the
    # zero-pad border must exist (aspect-preserving resize to <= H - PAD)
    assert sample["image"].max() > 0
    border = np.concatenate([
        sample["image"][:PAD // 4].ravel(),
        sample["image"][-(PAD // 4):].ravel(),
    ])
    assert np.all(border == 0) or np.all(
        sample["image"][:, : PAD // 4] == 0
    )


def test_pix3d_gt_double_rotation(pix3d_root):
    """GT cloud equals the raw npy double-rotated by -90 deg x/y then x
    (datasets_old.py:114-116 rotate(rotate(pcl, x, y), x))."""
    from fenet.geometry.pointcloud import rotate

    ds = Pix3DDataset(pix3d_root, category="chair", num_points=1024)
    with open(os.path.join(pix3d_root, "pix3d.json")) as f:
        entries = [e for e in json.load(f) if e["category"] == "chair"]
    raw = np.load(ds.pclpaths[0])
    angle = np.pi / 180.0 * -90
    expect = rotate(rotate(raw, angle, angle), angle)
    np.testing.assert_allclose(ds[0]["points"], expect, rtol=1e-6)
    assert len(entries) == 2


def test_pix3d_save_flag_returns_name(pix3d_root):
    ds = Pix3DDataset(pix3d_root, category="sofa", num_points=1024,
                      save=True)
    assert ds[0]["name"] == "0000"


def test_render_pix3d_cli(pix3d_root, tmp_path):
    """GT-vs-pred PNG pairs written for real samples (save_pix3d_img.py
    equivalent), using an untrained tiny checkpoint."""
    import jax

    from fenet.cli.render_pix3d import main
    from fenet.models.generator import Generator
    from fenet.train.checkpoint import save_checkpoint

    # fabricate a model_best.ckpt for the chair -> 03001627 mapping
    gen = Generator(num_points=1024, backbone="RepVGG-TEST",
                    fine_width=64, mid_width=32)
    variables = gen.init(
        jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32),
        train=False,
    )
    ckpt_dir = os.path.join(str(tmp_path), "out", "03001627", "checkpoints")
    save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"], "epoch": 0},
        is_best=True, category="03001627", ckpt_dir=ckpt_dir, epoch=0,
    )

    out_dir = os.path.join(str(tmp_path), "renders")
    written = main([
        "--cats", "chair",
        "--model", os.path.join(str(tmp_path), "out", "%s", "checkpoints"),
        "--data_dir", pix3d_root,
        "--backbone", "RepVGG-TEST",
        "--fine_width", "64", "--mid_width", "32",
        "--out_dir", out_dir,
        "--n_samples", "1",
    ])
    assert written["chair"] == 1
    gt = os.path.join(out_dir, "chair", "0000_gt.png")
    pr = os.path.join(out_dir, "chair", "0000_pr.png")
    assert os.path.exists(gt) and os.path.exists(pr)
    assert os.path.getsize(gt) > 0 and os.path.getsize(pr) > 0


def test_cam_overlay_writer(tmp_path):
    """save_cam_overlay writes a finite PNG (heatmap.py:43-126 overlay)."""
    import cv2
    import jax

    from fenet.models.generator import Generator
    from fenet.viz.gradcam import save_cam_overlay

    gen = Generator(num_points=1024, backbone="RepVGG-TEST",
                    fine_width=64, mid_width=32)
    img = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
    img *= 255
    variables = gen.init(jax.random.PRNGKey(0), img[:1], train=False)
    path = os.path.join(str(tmp_path), "cam.png")
    blended = save_cam_overlay(gen, variables, img, path)
    assert os.path.exists(path) and os.path.getsize(path) > 0
    assert blended.shape == (128, 128, 3) and blended.dtype == np.uint8
    back = cv2.imread(path)
    assert back is not None and np.isfinite(back).all()
