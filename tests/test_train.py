"""Training loop + checkpointing + batched eval on a sharded CPU mesh.

Most tests use a 2-device mesh: the 8-device emulation costs ~8x one
core's work per step (measured 21 s/step vs 2.6 s at tiny config), and the
sharding semantics (shard_map, pmean of grads/BN stats) are identical.
The full 8-device path is still exercised by test_train_step_full_8dev_mesh
here and by the driver's dryrun_multichip.
"""

import os

import jax
import numpy as np
import pytest

from fenet.data.loader import DataLoader
from fenet.data.synthetic import SyntheticShapeNet
from fenet.eval.runner import evaluate_dataset
from fenet.models.generator import Generator
from fenet.train.checkpoint import (
    export_torch_checkpoint,
    load_checkpoint,
    save_checkpoint,
    variables_to_torch_state_dict,
)
from fenet.train.config import TrainConfig
from fenet.train.trainer import Trainer, reference_lr_schedule


def _tiny_config(**kw):
    defaults = dict(
        batch_size=8,
        lr=1e-3,
        emd_eps=0.05,
        emd_iters=10,
        backbone="RepVGG-TEST",
        data_parallel=2,
        manual_seed=1,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_reference_lr_schedule_bands():
    lr0 = 5e-4
    assert reference_lr_schedule(lr0, 5) == lr0
    assert reference_lr_schedule(lr0, 10) == lr0  # decay happens after e10
    np.testing.assert_allclose(reference_lr_schedule(lr0, 11), lr0 * 0.1)
    np.testing.assert_allclose(reference_lr_schedule(lr0, 25), lr0 * 0.01)
    np.testing.assert_allclose(reference_lr_schedule(lr0, 31), lr0 * 1e-4)
    np.testing.assert_allclose(reference_lr_schedule(lr0, 50), lr0 * 1e-7)


@pytest.fixture(scope="module")
def trained():
    assert jax.device_count() == 8, "conftest must fake 8 CPU devices"
    cfg = _tiny_config()
    # Width-scaled decoder + 256 points: the default fine head alone is 134M
    # params, and every fixture consumer (3 train steps here, checkpoint
    # save/load x3 formats, torch export) pays for it again on this 1-core
    # sandbox (~100s of suite wall time measured at fine_width=64). The code
    # paths are identical at any width; full-width decoders are exercised
    # where the width matters — reference-parity and model-shape tests.
    gen = Generator(num_points=256, backbone=cfg.backbone,
                    fine_width=32, mid_width=16)
    trainer = Trainer(gen, cfg)
    rng = np.random.RandomState(0)
    state = trainer.init_state(
        jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32)
    )
    images = rng.rand(8, 128, 128, 3).astype(np.float32) * 255
    points = rng.rand(8, 256, 3).astype(np.float32)
    losses = []
    for step in range(3):
        state, stats = trainer.train_step(state, images, points, epoch=1,
                                          lr=cfg.lr)
        losses.append(float(stats["total_loss"]))
    return trainer, state, losses, (images, points), gen, cfg


def test_train_step_runs_and_improves(trained):
    _, _, losses, _, _, _ = trained
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # overfitting a fixed batch must improve


def test_train_step_epoch_band_changes_loss(trained):
    trainer, state, _, (images, points), _, cfg = trained
    _, s_early = trainer.train_step(state, images, points, epoch=5, lr=0.0)
    _, s_late = trainer.train_step(state, images, points, epoch=40, lr=0.0)
    early_total = float(s_early["total_loss"])
    late_total = float(s_late["total_loss"])
    np.testing.assert_allclose(
        late_total, 100 * float(s_late["emd_loss"]), rtol=1e-4
    )
    assert early_total > late_total  # CD term included only in early band


def test_checkpoint_roundtrip(tmp_path, trained):
    trainer, state, _, _, _, _ = trained
    ckpt_dir = str(tmp_path)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": 3,
        "train_time": 12.5,
    }
    save_checkpoint(payload, True, "cat", ckpt_dir, 3)
    assert os.path.exists(os.path.join(ckpt_dir, "model_best.ckpt"))
    restored = load_checkpoint(
        os.path.join(ckpt_dir, "model_best.ckpt"),
        target={
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        },
    )
    assert restored["epoch"] == 3 and restored["train_time"] == 12.5
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_checkpoint_roundtrip(tmp_path, trained):
    """fmt='orbax' writes a directory container with the same best-copy +
    JSON-sidecar semantics; load_checkpoint auto-detects it and restores
    the exact pytree structure (incl. optax namedtuple state). A flax-suffix
    path falls back to the orbax container so the eval CLIs work unchanged
    on orbax-trained runs."""
    trainer, state, _, _, _, _ = trained
    ckpt_dir = str(tmp_path)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": 4,
        "train_time": 2.5,
    }
    fn = save_checkpoint(payload, True, "cat", ckpt_dir, 4, fmt="orbax")
    assert os.path.isdir(fn)
    assert os.path.isdir(os.path.join(ckpt_dir, "model_best.orbax"))
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = load_checkpoint(
        os.path.join(ckpt_dir, "model_best.orbax"), target=target
    )
    assert restored["epoch"] == 4 and restored["train_time"] == 2.5
    assert jax.tree_util.tree_structure(
        restored["opt_state"]
    ) == jax.tree_util.tree_structure(state.opt_state)
    for x, y in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # flax-suffix path -> orbax container fallback (eval CLI compatibility)
    via_alt = load_checkpoint(os.path.join(ckpt_dir, "model_best.ckpt"))
    assert via_alt["epoch"] == 4


def test_torch_checkpoint_roundtrip(tmp_path, trained):
    """fenet -> .pth.tar -> fenet must be the identity on the generator."""
    torch = pytest.importorskip("torch")
    from fenet.models.convert import load_torch_checkpoint

    trainer, state, _, _, gen, _ = trained
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = str(tmp_path / "model_best.pth.tar")
    export_torch_checkpoint(variables, path, extra={"epoch": 7})
    back = load_torch_checkpoint(path)

    flat_orig = variables_to_torch_state_dict(variables)
    flat_back = variables_to_torch_state_dict(back)
    assert set(flat_orig) == set(flat_back)
    for k in flat_orig:
        np.testing.assert_allclose(flat_orig[k], flat_back[k], rtol=1e-6)


def test_evaluate_dataset_batched(trained):
    trainer, state, _, _, gen, _ = trained
    ds = SyntheticShapeNet(n_models=1, num_points=256)
    loader = DataLoader(ds, batch_size=8, drop_last=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    cd_m, emd_m, summary = evaluate_dataset(
        gen, variables, loader, category="test", mesh=trainer.mesh,
        icp_iterations=8, emd_iters=10,
    )
    assert summary["samples"] == 24
    assert np.isfinite(summary["ChamferDistance"])
    assert cd_m.better_than(None)


def test_eval_icp_stall_patience_lossless_on_trained_model(trained):
    """The production eval default (ICP stall_patience=32, fp32 plateau
    rel_tolerance) must match strict full-budget reference semantics
    (patience 0 AND rel_tolerance 0: no early exit of any kind) within
    fp32 rounding noise on TRAINED-model predictions — the PARITY.md #11
    claim, recorded here on genuinely trained weights rather than
    synthetic rotations (tests/test_geometry.py covers those). Predictions
    come from the module-scope trained fixture; both eval steps see
    identical inputs, so any metric difference is the early-exit
    machinery's doing. Measured: <=4e-6 absolute on x100 metrics (~1e-7
    relative) — iterations beyond the plateau move metrics only at the
    noise floor."""
    from fenet.eval.runner import make_eval_step

    trainer, state, _, (images, points), gen, _ = trained
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    kw = dict(mesh=trainer.mesh, icp_iterations=256, emd_iters=10)
    # Strict = genuinely full-budget: rel_tolerance=0 disables the fp32
    # plateau early-exit too (make_eval_step's default 1e-6 would otherwise
    # leak into the reference side of this comparison, and the PARITY #11
    # claim would only be patience-vs-rel-tol, not patience-vs-full-budget).
    strict_step, _ = make_eval_step(
        gen, icp_patience=0, icp_rel_tolerance=0.0, **kw
    )
    prod_step, _ = make_eval_step(gen, icp_patience=32, **kw)
    img8 = images.astype(np.uint8)
    strict = strict_step(variables, img8, points)
    prod = prod_step(variables, img8, points)
    for key in ("cd", "emd"):
        np.testing.assert_allclose(
            np.asarray(strict[key]), np.asarray(prod[key]),
            rtol=1e-6, atol=1e-5, err_msg=key,
        )


@pytest.mark.fast
def test_train_step_full_8dev_mesh():
    """One step over all 8 fake devices: per-shard batch 1, pmean'd grads.
    With lr=0 the losses must match a 2-device run of the same batch
    (pmean over more shards of the same data).

    Standalone tiny model (width-scaled decoder, 256 pts, 64x64) rather
    than the trained fixture: the 8 partitions serialize on this 1-core
    host, and at the fixture's default widths one step cost ~170s of suite
    wall time; at fine_width=32 the identical code path runs in seconds."""
    assert jax.device_count() == 8, "conftest must fake 8 CPU devices"
    rng = np.random.RandomState(0)
    gen = Generator(num_points=256, backbone="RepVGG-TEST",
                    fine_width=32, mid_width=16)
    images = rng.rand(8, 64, 64, 3).astype(np.float32) * 255
    points = rng.rand(8, 256, 3).astype(np.float32)

    def one_step(dp):
        cfg = _tiny_config(data_parallel=dp, emd_iters=2)
        trainer = Trainer(gen, cfg)
        st = trainer.init_state(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
        )
        _, stats = trainer.train_step(st, images, points, epoch=1, lr=0.0)
        return {k: float(v) for k, v in stats.items()}

    s8 = one_step(8)
    s2 = one_step(2)
    # sync_bn (the default) gives every dp the GLOBAL batch's BN statistics
    # (round-3 change; with sync_bn=False the per-replica statistics shift
    # the forward by O(1e-3) relative between shardings).
    for key in s2:
        np.testing.assert_allclose(s8[key], s2[key], rtol=5e-4, err_msg=key)


def test_finetune_loss_mode():
    # Width-scaled for the same reason as the `trained` fixture: the
    # finetune step (projection + BCE + CD/EMD, backward, Adam) is the same
    # program at fine_width=64 for a fraction of the 178s this cost at
    # default widths on the 1-core sandbox.
    cfg = _tiny_config(lambda_bce=100.0, grid_h=32, grid_w=32)
    gen = Generator(num_points=256, backbone=cfg.backbone,
                    fine_width=64, mid_width=32)
    trainer = Trainer(gen, cfg, loss_mode="finetune")
    state = trainer.init_state(
        jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32)
    )
    rng = np.random.RandomState(1)
    images = rng.rand(8, 128, 128, 3).astype(np.float32) * 255
    points = (rng.rand(8, 256, 3).astype(np.float32) - 0.5) * 0.8
    state, stats = trainer.train_step(state, images, points, epoch=1,
                                      lr=cfg.lr)
    assert np.isfinite(float(stats["total_loss"]))

    # --proj_squash variant (CAPNet tanh composition): separate jitted
    # program (the squash flag is in the step's hash key), finite loss.
    import dataclasses

    sq_trainer = Trainer(gen, dataclasses.replace(cfg, proj_squash=True),
                         loss_mode="finetune")
    sq_state = sq_trainer.init_state(
        jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32)
    )
    _, sq_stats = sq_trainer.train_step(sq_state, images, points, epoch=1,
                                        lr=cfg.lr)
    assert np.isfinite(float(sq_stats["total_loss"]))
