"""Tensor-parallel (Megatron) sharding: rules, state placement, and a
dp x tp training step that matches the dp-only step numerically.

Runs on the suite's 8 virtual CPU devices (conftest).  Shapes and decoder
widths are kept tiny: XLA's in-process CPU collective rendezvous kills the
process if partitions arrive >40s apart on this single-core host.
"""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from fenet.models.generator import Generator
from fenet.parallel.mesh import make_mesh, shard_batch
from fenet.parallel.tp import (
    MODEL_AXIS,
    is_tp_mesh,
    make_dp_tp_mesh,
    tree_shardings,
)
from fenet.train.config import TrainConfig
from fenet.train.trainer import Trainer


def test_megatron_rules_on_param_paths():
    mesh = make_dp_tp_mesh(2, 2)
    fake = {
        "params": {
            "decoder": {
                "fc1_1": {"kernel": 0, "bias": 0},
                "conv1_1": {"kernel": 0, "bias": 0},
                "fc2_1": {"kernel": 0, "bias": 0},
                "conv2_1": {"kernel": 0, "bias": 0},
                "fc1": {"kernel": 0, "bias": 0},
            },
            "RepVGG": {"stage0": {"kernel": 0}},
        }
    }
    sh = tree_shardings(fake, mesh)
    d = sh["params"]["decoder"]
    assert d["fc1_1"]["kernel"].spec == P(None, MODEL_AXIS)  # column
    assert d["fc1_1"]["bias"].spec == P(MODEL_AXIS)
    assert d["conv1_1"]["kernel"].spec == P(MODEL_AXIS, None)  # row
    assert d["conv1_1"]["bias"].spec == P()
    assert d["fc2_1"]["kernel"].spec == P(None, MODEL_AXIS)
    assert d["conv2_1"]["kernel"].spec == P(MODEL_AXIS, None)
    assert d["fc1"]["kernel"].spec == P()  # untouched
    assert sh["params"]["RepVGG"]["stage0"]["kernel"].spec == P()


def _tiny(cfg_kw, mesh):
    model = Generator(num_points=256, backbone="RepVGG-TEST",
                      fine_width=32, mid_width=16)
    cfg = TrainConfig(batch_size=4, emd_iters=2, backbone="RepVGG-TEST",
                      **cfg_kw)
    trainer = Trainer(model, cfg, mesh=mesh)
    state = trainer.init_state(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    return trainer, state


def test_tp_eval_step_matches_single_device():
    """The batched eval step (forward + CD/EMD metrics) on a dp x tp mesh
    with Megatron-sharded variables must reproduce the single-device
    metrics: GSPMD places the decoder all-reduces, and per-sample metrics
    are independent of the batch sharding. ICP is disabled here — it is
    batch-dim-only (never model-sharded), and its iterative alignment of
    random-init clouds chaotically amplifies the ~1e-6 reduction-order
    difference of the TP matmuls into percent-level metric noise."""
    from fenet.eval.runner import make_eval_step
    from fenet.parallel.tp import shard_tree

    assert jax.device_count() >= 4
    model = Generator(num_points=256, backbone="RepVGG-TEST",
                      fine_width=32, mid_width=16)
    rng = np.random.RandomState(7)
    images = (rng.rand(4, 64, 64, 3) * 255).astype(np.uint8)
    points = rng.rand(4, 256, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32), train=False)

    kw = dict(align=False, emd_iters=2)
    step1, mesh1 = make_eval_step(model, mesh=make_mesh(1), **kw)
    out1 = step1(variables, images, points)

    mesh_tp = make_dp_tp_mesh(2, 2)
    vars_tp = shard_tree(variables, mesh_tp)
    k = vars_tp["params"]["decoder"]["fc1_1"]["kernel"]
    assert k.sharding.spec == P(None, MODEL_AXIS)
    step_tp, _ = make_eval_step(model, mesh=mesh_tp, **kw)
    b = shard_batch({"i": images, "p": points}, mesh_tp)
    out_tp = step_tp(vars_tp, b["i"], b["p"])

    for key in ("cd", "emd"):
        np.testing.assert_allclose(
            np.asarray(out_tp[key]), np.asarray(out1[key]), rtol=2e-4,
            atol=1e-5, err_msg=key,
        )


def test_tp_state_sharded_and_step_matches_dp():
    """One optimizer step on a (2, 2) dp x tp mesh must match the plain
    2-device dp mesh: same losses, same updated Megatron params (the split
    changes reduction order only)."""
    assert jax.device_count() >= 4
    rng = np.random.RandomState(0)
    images = rng.rand(4, 64, 64, 3).astype(np.float32) * 255
    points = rng.rand(4, 256, 3).astype(np.float32)

    mesh_tp = make_dp_tp_mesh(2, 2)
    assert is_tp_mesh(mesh_tp)
    tr_tp, st_tp = _tiny({"data_parallel": 2, "model_parallel": 2}, mesh_tp)

    # Megatron leaves are genuinely model-sharded, including Adam moments.
    k = st_tp.params["decoder"]["fc1_1"]["kernel"]
    assert k.sharding.spec == P(None, MODEL_AXIS)
    mu = st_tp.opt_state[1].mu["decoder"]["fc1_1"]["kernel"]
    assert mu.sharding.spec == P(None, MODEL_AXIS)

    mesh_dp = make_mesh(2)
    tr_dp, st_dp = _tiny({"data_parallel": 2}, mesh_dp)

    def run(trainer, state, mesh):
        b = shard_batch({"i": images, "p": points}, mesh)
        new, stats = trainer.train_step(state, b["i"], b["p"], epoch=1,
                                        lr=5e-4)
        return new, {k: float(v) for k, v in stats.items()}

    new_tp, stats_tp = run(tr_tp, st_tp, mesh_tp)
    new_dp, stats_dp = run(tr_dp, st_dp, mesh_dp)

    for key in stats_dp:
        np.testing.assert_allclose(stats_tp[key], stats_dp[key], rtol=2e-4,
                                   err_msg=key)
    # Tolerance note: after ONE Adam step the moments are near zero, so the
    # update is mu/(sqrt(nu)+eps) with both operands tiny — where grad noise
    # from the two all-reduce orderings (manual pmean vs GSPMD-placed)
    # crosses zero, the per-element update flips by up to ~lr (measured:
    # 2 / 8.4M elements off by 1.7e-4 at lr=5e-4).  A real layout bug
    # (transposed / half-gathered shard) corrupts a macroscopic fraction of
    # elements, so assert on the mismatch FRACTION at a tight tolerance and
    # bound every element by 2*lr.
    def assert_updates_match(a, b, lr=5e-4):
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(a - b)
        frac = np.mean(diff > (2e-5 + 2e-4 * np.abs(b)))
        assert frac < 1e-4, f"{frac:.2e} of elements mismatch"
        assert diff.max() < 2 * lr, f"max diff {diff.max():.2e} >= 2*lr"

    assert_updates_match(new_tp.params["decoder"]["fc1_1"]["kernel"],
                         new_dp.params["decoder"]["fc1_1"]["kernel"])
    assert_updates_match(new_tp.params["decoder"]["conv1_1"]["kernel"],
                         new_dp.params["decoder"]["conv1_1"]["kernel"])
