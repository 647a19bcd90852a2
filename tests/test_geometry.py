"""Geometry layer: projection parity vs numpy oracles, ICP recovery."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.spatial.distance

from fenet.geometry.icp import align_pred_to_gt, batched_icp, best_fit_transform
from fenet.geometry.pointcloud import (
    average_pcl,
    outlier,
    preprocess_pcl_gt,
    rotate,
    scale2one,
)
from fenet.geometry.projection import (
    cont_proj,
    perspective_transform,
    project_silhouettes,
    world2cam,
)
from fenet.losses.projection import grid_dist


def test_cont_proj_matches_dense_oracle():
    rng = np.random.RandomState(0)
    pcl = (rng.rand(2, 64, 3) * 2 - 1).astype(np.float32)
    h = w = 16
    sigma_sq = 0.5
    # Dense (B, N, H, W) oracle, the reference's formulation.
    x = (pcl[..., 0] + 1) * h / 2
    y = (pcl[..., 1] + 1) * w / 2
    gx = np.arange(h, dtype=np.float32)
    gy = np.arange(w, dtype=np.float32)
    kx = np.exp(-((x[..., None] - gx) ** 2) / (2 * sigma_sq))
    ky = np.exp(-((y[..., None] - gy) ** 2) / (2 * sigma_sq))
    oracle = (kx[:, :, :, None] * ky[:, :, None, :]).sum(1)
    ours = cont_proj(jnp.asarray(pcl), h, w, sigma_sq)
    np.testing.assert_allclose(np.asarray(ours), oracle, rtol=1e-4, atol=1e-4)


def test_world2cam_and_perspective_oracle():
    rng = np.random.RandomState(1)
    pcl = (rng.rand(2, 32, 3) * 2 - 1).astype(np.float32)
    az, el = 0.3, -0.2
    # numpy oracle following projection.py:148-199 exactly
    raz = np.array([[1, 0, 0],
                    [0, np.cos(az), -np.sin(az)],
                    [0, np.sin(az), np.cos(az)]], np.float32)
    rel = np.array([[np.cos(el), 0, np.sin(el)],
                    [0, 1, 0],
                    [-np.sin(el), 0, np.cos(el)]], np.float32)
    rot = rel @ raz
    t = np.array([0, 0, -2.5], np.float32)
    oracle = (rot @ (pcl - t).transpose(0, 2, 1)).transpose(0, 2, 1)
    ours = world2cam(jnp.asarray(pcl), jnp.full(2, az), jnp.full(2, el))
    np.testing.assert_allclose(np.asarray(ours), oracle, rtol=1e-4, atol=1e-5)

    k = np.array([[120, 0, -32], [0, 120, -32], [0, 0, 1]], np.float32)
    proj = (k @ oracle.transpose(0, 2, 1)).transpose(0, 2, 1)
    xy = proj[..., :2] / np.abs(oracle[..., 2:3])
    oracle_p = np.concatenate([xy, np.abs(proj[..., 2:3])], -1)
    ours_p = perspective_transform(jnp.asarray(oracle))
    np.testing.assert_allclose(np.asarray(ours_p), oracle_p, rtol=1e-4, atol=1e-4)


def test_project_silhouettes_differentiable():
    import jax

    rng = np.random.RandomState(2)
    pred = jnp.asarray(rng.rand(2, 128, 3) * 2 - 1, jnp.float32)
    gt = jnp.asarray(rng.rand(2, 128, 3) * 2 - 1, jnp.float32)

    def loss(p):
        sp, sg = project_silhouettes(p, gt, 32, 32)
        return jnp.mean((sp - sg) ** 2)

    g = jax.grad(loss)(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0  # the reference's detach would zero this


def test_outlier_clamps_per_axis_argmax():
    rng = np.random.RandomState(3)
    p = rng.rand(2, 50, 3).astype(np.float32)
    p[0, 7, 0] = 10.0  # planted outlier
    out = np.asarray(outlier(jnp.asarray(p), 0.5, 0.25, 0.125))
    assert out[0, 7, 0] == 0.5
    # exactly one element changed per (batch, axis)
    assert (out != p).sum() <= 6


def test_scale2one_extent():
    rng = np.random.RandomState(4)
    p = jnp.asarray(rng.rand(2, 100, 3) * 7, jnp.float32)
    s = np.asarray(scale2one(p))
    ext = s.max(1) - s.min(1)
    np.testing.assert_allclose(ext, 2.0, rtol=1e-5)


def test_preprocess_pcl_gt_axes():
    p = np.array([[[1.0, 2.0, 3.0]]], np.float32)
    out = np.asarray(preprocess_pcl_gt(jnp.asarray(p)))
    np.testing.assert_allclose(out, [[[-2.0, -3.0, 1.0]]])


def test_rotate_double_matches_dataset_usage():
    rng = np.random.RandomState(5)
    xyz = rng.rand(10, 3)
    ang = np.pi / 180.0 * -90
    out = rotate(rotate(xyz, ang, ang), ang)
    assert out.shape == (10, 3)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                               np.linalg.norm(xyz, axis=1), rtol=1e-6)


def test_best_fit_transform_recovers_rigid_motion():
    rng = np.random.RandomState(6)
    a = rng.rand(64, 3).astype(np.float32)
    theta = 0.4
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    b = a @ r.T + np.array([0.1, -0.2, 0.3], np.float32)
    t = np.asarray(best_fit_transform(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(t[:3, :3], r, atol=1e-4)
    np.testing.assert_allclose(t[:3, 3], [0.1, -0.2, 0.3], atol=1e-4)


def test_icp_aligns_rotated_cloud():
    rng = np.random.RandomState(7)
    gt = rng.rand(2, 256, 3).astype(np.float32)
    theta = 0.2
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    pred = gt @ r.T + 0.05
    aligned = np.asarray(
        align_pred_to_gt(jnp.asarray(pred), jnp.asarray(gt),
                         max_iterations=64, tolerance=1e-10)
    )
    before = np.abs(pred - gt).mean()
    after = np.abs(aligned - gt).mean()
    assert after < 0.2 * before, (before, after)


def test_icp_stall_patience_is_lossless():
    """Stopping after `stall_patience` non-improving iterations must return
    the same transform as the full budget: best-so-far tracking means extra
    wandering iterations can't improve the returned state (they only matter
    if a later iteration finds a new best — which on a well-posed problem
    happens within the first few dozen)."""
    rng = np.random.RandomState(3)
    gt = rng.rand(4, 256, 3).astype(np.float32) * 0.9
    theta = 0.25
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    pred = gt @ r.T + 0.08 + rng.randn(4, 256, 3).astype(np.float32) * 0.003
    t_full = np.asarray(
        batched_icp(jnp.asarray(gt), jnp.asarray(pred), max_iterations=512,
                    stall_patience=0)
    )
    t_pat = np.asarray(
        batched_icp(jnp.asarray(gt), jnp.asarray(pred), max_iterations=512,
                    stall_patience=32)
    )
    np.testing.assert_allclose(t_pat, t_full, atol=1e-5)


def test_icp_coarse_to_fine_matches_cold_start():
    """The coarse-to-fine warm start (coarse_points) must land on the same
    transform as cold-start ICP on a well-posed alignment: the full-res
    phase runs the same convergence machinery to the same thresholds, so
    the warm start only changes where the basin is entered."""
    rng = np.random.RandomState(5)
    gt = rng.rand(4, 1024, 3).astype(np.float32) * 0.9
    theta = 0.3
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    pred = gt @ r.T + 0.06 + rng.randn(4, 1024, 3).astype(np.float32) * 0.002
    t_cold = np.asarray(
        batched_icp(jnp.asarray(gt), jnp.asarray(pred), max_iterations=512)
    )
    t_warm = np.asarray(
        batched_icp(jnp.asarray(gt), jnp.asarray(pred), max_iterations=512,
                    coarse_points=256)
    )
    np.testing.assert_allclose(t_warm, t_cold, atol=2e-4)
    # And it genuinely aligns (not just agrees with itself).
    rr, tt = t_warm[:, :3, :3], t_warm[:, :3, 3]
    aligned = np.einsum("bij,bnj->bni", rr, gt) + tt[:, None, :]
    assert np.abs(aligned - pred).mean() < 0.01


def test_icp_coarse_points_above_n_is_cold_start():
    """coarse_points >= N must reduce to the plain cold-start path."""
    rng = np.random.RandomState(6)
    gt = rng.rand(2, 128, 3).astype(np.float32)
    pred = gt @ np.eye(3, dtype=np.float32) + 0.02
    t_plain = np.asarray(batched_icp(jnp.asarray(gt), jnp.asarray(pred),
                                     max_iterations=64))
    t_big = np.asarray(batched_icp(jnp.asarray(gt), jnp.asarray(pred),
                                   max_iterations=64, coarse_points=128))
    np.testing.assert_allclose(t_big, t_plain, atol=0)


def test_icp_coarse_points_gates_on_smaller_cloud():
    """The coarse gate must consider BOTH cloud sizes: with b smaller than
    coarse_points the stride b.shape[1] // coarse_points would be zero and
    crash at trace time (round-4 review finding) — such calls must fall
    back to cold start instead."""
    rng = np.random.RandomState(7)
    gt = rng.rand(2, 1024, 3).astype(np.float32)  # a: above coarse_points
    pred = rng.rand(2, 512, 3).astype(np.float32)  # b: below coarse_points
    t_coarse = np.asarray(batched_icp(jnp.asarray(gt), jnp.asarray(pred),
                                      max_iterations=16, coarse_points=600))
    t_plain = np.asarray(batched_icp(jnp.asarray(gt), jnp.asarray(pred),
                                     max_iterations=16))
    np.testing.assert_allclose(t_coarse, t_plain, atol=0)


def test_grid_dist_matches_scipy():
    ours = grid_dist(8, 8)
    x, y = np.meshgrid(range(8), range(8), indexing="ij")
    grid = np.stack([x.ravel(), y.ravel()], 1)
    ref = scipy.spatial.distance.cdist(grid, grid).reshape(8, 8, 8, 8)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_cont_proj_squash_bounds_and_bce():
    """--proj_squash (CAPNet tanh composition): silhouettes land in [0, 1)
    so the bce_prob term is bounded below — the raw-sum default exceeds 1
    under overlapping points and its BCE is not (PARITY.md #3)."""
    import jax

    from fenet.losses.projection import get_loss_proj

    rng = np.random.RandomState(3)
    # All points piled near the center: maximal splat overlap.
    pcl = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.05)
    raw = cont_proj(pcl, 16, 16, 0.5)
    squashed = cont_proj(pcl, 16, 16, 0.5, squash=True)
    assert float(raw.max()) > 1.0  # the premise: raw sums saturate
    # [0, 1] closed in fp32: tanh of a large sum rounds to exactly 1.0;
    # bce_prob's floored log keeps value and gradient finite there.
    assert 0.0 <= float(squashed.min()) and float(squashed.max()) <= 1.0
    np.testing.assert_allclose(
        np.asarray(squashed), np.tanh(np.asarray(raw)), rtol=1e-5, atol=1e-6
    )

    # bce_prob on squashed silhouettes is bounded below by its value at
    # gt==pred-ish configurations; concretely it stays finite and its
    # gradient is finite at the saturation point where the raw-sum loss
    # heads to -inf.
    gt = cont_proj(pcl, 16, 16, 0.5, squash=True)

    def loss(p):
        out, _, _ = get_loss_proj(cont_proj(p, 16, 16, 0.5, squash=True),
                                  gt, "bce_prob")
        return out

    val = float(loss(pcl))
    g = jax.grad(loss)(pcl)
    assert np.isfinite(val) and np.isfinite(np.asarray(g)).all()


@pytest.mark.fast
def test_project_silhouettes_squash_plumbs_through():
    rng = np.random.RandomState(4)
    pred = jnp.asarray(rng.rand(2, 64, 3) * 2 - 1, jnp.float32)
    gt = jnp.asarray(rng.rand(2, 64, 3) * 2 - 1, jnp.float32)
    sp_raw, _ = project_silhouettes(pred, gt, 32, 32)
    sp_sq, sg_sq = project_silhouettes(pred, gt, 32, 32, squash=True)
    np.testing.assert_allclose(
        np.asarray(sp_sq), np.tanh(np.asarray(sp_raw)), rtol=1e-5, atol=1e-6
    )
    assert float(sp_sq.max()) <= 1.0 and float(sg_sq.max()) <= 1.0
