"""Camera math, PLY I/O, render helpers, meters."""

import numpy as np

from fenet.geometry.camera import (
    get_blender_proj,
    get_img_points,
    normalize_imagenet,
    transform_points,
)
from fenet.utils.average_meter import AverageMeter
from fenet.utils.ply import export_pointcloud, load_pointcloud

import pytest

pytestmark = pytest.mark.fast  # core tier: `pytest -m fast` (<5 min warm)


def test_blender_projection_shapes_and_reprojection():
    k, rt = get_blender_proj(az=30.0, el=25.0, distance_ratio=0.7)
    assert k.shape == (3, 3) and rt.shape == (3, 4)
    rng = np.random.RandomState(0)
    pcl = rng.rand(50, 3) * 0.4 - 0.2
    uv = get_img_points(pcl, k, rt)
    assert uv.shape == (50, 2)
    assert (uv >= 0).all() and (uv < 224).all()


def test_transform_points_rt_and_k():
    rng = np.random.RandomState(1)
    pts = rng.rand(2, 10, 3)
    rt = np.tile(np.hstack([np.eye(3), np.ones((3, 1))])[None], (2, 1, 1))
    out = transform_points(pts, rt)
    np.testing.assert_allclose(out, pts + 1.0)
    k = np.tile((2 * np.eye(3))[None], (2, 1, 1))
    np.testing.assert_allclose(transform_points(pts, k), 2 * pts)


def test_normalize_imagenet():
    x = np.full((1, 4, 4, 3), 0.5, np.float32)
    out = normalize_imagenet(x)
    np.testing.assert_allclose(out[0, 0, 0],
                               (0.5 - np.array([0.485, 0.456, 0.406]))
                               / np.array([0.229, 0.224, 0.225]), rtol=1e-5)


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    cloud = rng.rand(100, 3).astype(np.float32)
    for as_text in (True, False):
        path = str(tmp_path / f"c_{as_text}.ply")
        export_pointcloud(cloud, path, as_text=as_text)
        back = load_pointcloud(path)
        np.testing.assert_allclose(back, cloud, rtol=1e-4, atol=1e-5)


def test_render_helpers(tmp_path):
    from fenet.viz.render import get_ptcloud_img, render_clouds

    rng = np.random.RandomState(3)
    cloud = rng.rand(64, 3)
    img = get_ptcloud_img(cloud)
    assert img.ndim == 3 and img.shape[2] == 3
    comp = render_clouds({"gt": cloud, "pred": cloud * 0.9},
                         path=str(tmp_path / "c.png"),
                         image=rng.rand(128, 128, 3) * 255)
    assert comp.ndim == 3
    assert (tmp_path / "c.png").exists()


def test_average_meter_reference_interface():
    m = AverageMeter(["a", "b"])
    m.update([1.0, 2.0])
    m.update([3.0, 4.0])
    assert m.val() == [3.0, 4.0]
    assert m.avg() == [2.0, 3.0]
    assert m.avg(1) == 3.0
    s = AverageMeter()
    s.update(5.0)
    assert s.val() == 5.0 and s.avg() == 5.0
