"""Loss facade, F-score, projection loss, metric registry."""

import jax
import jax.numpy as jnp
import numpy as np

from fenet.eval.metrics import Metrics, eval_metrics
from fenet.losses.facade import Loss, chamfer_loss, emd_loss, scheduled_total_loss
from fenet.losses.fscore import fscore
from fenet.losses.projection import get_loss_proj, grid_dist

import pytest

pytestmark = pytest.mark.fast  # core tier: `pytest -m fast` (<5 min warm)


def _clouds(seed=0, b=2, n=128):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.rand(b, n, 3), jnp.float32),
        jnp.asarray(rng.rand(b, n, 3), jnp.float32),
    )


def test_loss_facade_smoke():
    """Mirror of loss/loss.py's __main__ smoke block (with small iter count)."""
    pred, gt = _clouds()
    cd = Loss().get_chamfer_loss(pred, gt)
    assert float(cd) > 0
    e = emd_loss(pred, gt, 0.05, 100)
    assert 0 < float(e) < 2.0


def test_chamfer_loss_zero_for_identical():
    pred, _ = _clouds()
    assert float(chamfer_loss(pred, pred)) < 1e-6


def test_scheduled_loss_epoch_bands():
    pred, gt = _clouds(1)
    t20, aux20 = scheduled_total_loss(pred, gt, epoch=20, emd_iters=100)
    t40, aux40 = scheduled_total_loss(pred, gt, epoch=40, emd_iters=100)
    np.testing.assert_allclose(
        float(t20),
        100 * float(aux20["chamfer_loss"]) + 100 * float(aux20["emd_loss"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(t40), 100 * float(aux40["emd_loss"]), rtol=1e-5
    )


def test_fscore_perfect_match():
    pred, _ = _clouds(2)
    f, p1, p2 = fscore(pred, pred)
    assert float(f) == 1.0 and float(p1) == 1.0


def test_projection_loss_variants():
    rng = np.random.RandomState(3)
    pred = jnp.asarray(rng.rand(2, 8, 8), jnp.float32)
    gt = jnp.asarray((rng.rand(2, 8, 8) > 0.5).astype(np.float32))
    for lt in ("bce", "weighted_bce", "bce_prob"):
        loss, _, _ = get_loss_proj(pred, gt, lt)
        assert np.isfinite(float(loss))
    loss, fwd, bwd = get_loss_proj(
        pred, gt, "bce_prob", 1.0, True, jnp.asarray(grid_dist(8, 8))
    )
    assert fwd.shape == (2, 8, 8) and bwd.shape == (2, 8, 8)


def test_bce_prob_matches_reference_formula():
    rng = np.random.RandomState(4)
    pred = rng.rand(2, 4, 4).astype(np.float32)
    gt = (rng.rand(2, 4, 4) > 0.5).astype(np.float32)
    eps = 1e-8
    ref = (-gt * np.log(pred + eps) - (1 - gt) * np.log(np.abs(1 - pred - eps))).mean()
    got, _, _ = get_loss_proj(jnp.asarray(pred), jnp.asarray(gt), "bce_prob")
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_bce_prob_saturated_silhouette_grad_bounded():
    """Regression (round 5): the splat silhouette is a SUM of gaussians, so
    cells cross the log|1-p-eps| singularity at p = 1 - 1e-8. Unguarded,
    the finetune step's gradient went inf -> NaN params after one step
    (measured on chip: 24.8 img/s of NaN auctions vs 125 fixed). The loss
    must stay finite and its gradient bounded exactly AT the singularity
    and across the saturated range."""
    vals = np.array([[[0.0, 0.5, 1.0 - 1e-8],
                      [1.0, 1.5, 5.1]]], np.float32)  # (1, 2, 3) grid
    gt = np.zeros_like(vals)  # (1-gt) weight hits the singular log term

    def loss(p):
        out, _, _ = get_loss_proj(p, jnp.asarray(gt), "bce_prob")
        return out

    v, g = jax.value_and_grad(loss)(jnp.asarray(vals))
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.max(np.abs(np.asarray(g))) <= 1e7 + 1.0  # 1/floor bound
    # Away from the floor band the guarded value equals the reference's.
    eps = 1e-8
    ref = (-gt * np.log(vals + eps)
           - (1 - gt) * np.log(np.maximum(np.abs(1 - vals - eps), 1e-7)))
    np.testing.assert_allclose(float(v), ref.mean(), rtol=1e-5)


def test_eval_metrics_and_registry():
    pred, gt = _clouds(5)
    vals = eval_metrics(pred, gt)
    assert set(vals) == {"EMD_distance", "ChamferDistance"}
    got = Metrics.get(np.asarray(pred), np.asarray(gt))
    assert len(got) == 2 and all(v > 0 for v in got)

    better = Metrics("ChamferDistance", [5.0, 1.0])
    worse = Metrics("ChamferDistance", [4.0, 2.0])
    assert better.better_than(worse)
    assert better.better_than(None)
    assert not worse.better_than(better)
    assert Metrics("EMD_distance", {"EMD_distance": 3.0}).state_dict()[
        "EMD_distance"
    ] == 3.0


def test_training_gradient_through_both_losses():
    pred, gt = _clouds(6)

    def loss_fn(p):
        t, _ = scheduled_total_loss(p, gt, epoch=5, emd_iters=50)
        return t

    g = jax.grad(loss_fn)(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
