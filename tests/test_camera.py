"""Camera/Blender math parity (utils/cam_read.py rebuild)."""

import os

import numpy as np

from fenet.geometry.camera import (
    PARAMS,
    camera_info,
    degree2rad,
    get_img_cam,
    get_rotate_matrix,
    get_w2o_mat,
    project_points,
    reproject_views,
    rotation_matrix_x,
    rotation_matrix_y,
    rotation_matrix_z,
    view_transform,
)


def test_params_table_shape_and_ranges():
    """The per-view metadata table (cam_read.py:11-48): 36 views of
    [az, el, inl, dist_ratio, f_mm, sensor_mm, cam_max_dist, shift xyz]."""
    assert PARAMS.shape == (36, 10)
    assert (PARAMS[:, 0] >= 0).all() and (PARAMS[:, 0] < 360).all()  # az
    assert (PARAMS[:, 4] == 35).all() and (PARAMS[:, 5] == 32).all()
    assert (PARAMS[:, 6] == 1.75).all()
    assert (np.abs(PARAMS[:, 7:]) < 0.25).all()  # object shifts


def test_degree2rad_azimuth_shift():
    p = degree2rad(PARAMS[0])
    assert np.isclose(p[0], np.deg2rad(PARAMS[0, 0] + 180.0))
    assert np.isclose(p[1], np.deg2rad(PARAMS[0, 1]))
    assert p[3] == PARAMS[0, 3]  # untouched


def test_camera_info_orthonormal():
    for row in PARAMS[:5]:
        cam_mat, cam_pos = get_img_cam(row)
        np.testing.assert_allclose(cam_mat @ cam_mat.T, np.eye(3),
                                   atol=1e-12)
        assert np.isclose(np.linalg.det(cam_mat), 1.0)
        np.testing.assert_allclose(cam_pos, [0, 0, -row[3]], atol=1e-12)


def test_rotation_helpers_match_composition():
    a = 0.7
    for m in (rotation_matrix_x(a), rotation_matrix_y(a),
              rotation_matrix_z(a)):
        np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3),
                                   atol=1e-12)
    # the reference composite: neg @ Rz @ Rz @ scale_y_neg @ Rx
    # (cam_read.py:142); det = (-1)^3 * 1 * 1 * (-1) * 1 = +1
    comp = get_rotate_matrix(-np.pi / 2)
    assert comp.shape == (4, 4)
    assert np.isclose(np.linalg.det(comp[:3, :3]), 1.0)


def test_w2o_translation():
    m = get_w2o_mat((0.1, -0.2, 0.3))
    np.testing.assert_allclose(
        (m @ np.array([0, 0, 0, 1.0]))[:3], [0.1, -0.2, 0.3]
    )


def test_view_transform_projects_origin_in_frame():
    """The shifted object origin must land inside the 128x128 frame for
    every recorded view (what the gen_obj_img_h5 demo visualizes)."""
    for row in PARAMS:
        trans = view_transform(row, img_w=128, img_h=128)
        xy = project_points(np.zeros((1, 3)), trans)
        assert xy.shape == (1, 2)
        assert (0 <= xy).all() and (xy < 128).all(), (row[:2], xy)


def test_reproject_views_writes_overlays(tmp_path):
    import cv2

    img_dir = str(tmp_path)
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(os.path.join(img_dir, f"{i:02d}.png"),
                    rng.randint(0, 255, (128, 128, 3), np.uint8))
    results = reproject_views(img_dir, params=PARAMS[:3])
    assert len(results) == 3
    for i in range(3):
        out = os.path.join(img_dir, f"{i:02d}_out.png")
        assert os.path.exists(out) and os.path.getsize(out) > 0
