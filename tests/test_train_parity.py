"""Trained-parity harness: fenet's optimization dynamics vs the real
reference semantics (torch Adam + a torch training loop).

Round-2 verdict gap: op-level and forward parity were covered, but nothing
demonstrated that *training* matches the reference. Three layers here:

1. ``make_optimizer`` == ``torch.optim.Adam(lr=5e-4, weight_decay=1e-4)``
   step-for-step on identical params/grads (train.py:115) — catches a
   silent L2-decay/moment-order mismatch that would corrupt every run
   while all other tests stay green.
2. K full train steps of the fenet Trainer (from a converted identical
   init) vs an independent torch loop with the same architecture, data,
   LR, and loss composition (100*CD + 100*EMD, train.py:162-171) —
   per-step CD/EMD losses must track.
3. Adaptive epsilon-scaling (``--emd_scale_phases 3``) reaches the same
   losses as strict reference mode on the same short training run —
   the end-to-end evidence PARITY.md #10 cites.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from fenet.models.convert import (  # noqa: E402
    merge_variables,
    torch_state_dict_to_variables,
)
from fenet.models.generator import Generator  # noqa: E402
from fenet.models.repvgg import REPVGG_CONFIGS  # noqa: E402
from fenet.ops.emd import earth_mover_distance  # noqa: E402
from fenet.train.config import TrainConfig  # noqa: E402
from fenet.train.trainer import (  # noqa: E402
    Trainer,
    make_optimizer,
    reference_lr_schedule,
)

from torch_ref_models import _TorchGenerator  # noqa: E402


def test_make_optimizer_matches_torch_adam():
    """One-to-one vs torch.optim.Adam(lr=5e-4, weight_decay=1e-4)
    (train.py:115): torch applies L2 decay to the gradient BEFORE the
    Adam moments (not AdamW), which is exactly optax
    add_decayed_weights -> scale_by_adam."""
    rng = np.random.RandomState(0)
    params = {
        "w": rng.randn(16, 8).astype(np.float32),
        "b": rng.randn(8).astype(np.float32),
        "nest": {"k": rng.randn(4, 4, 3, 2).astype(np.float32)},
    }
    grads_seq = [
        jax.tree_util.tree_map(
            lambda p: rng.randn(*p.shape).astype(np.float32), params
        )
        for _ in range(5)
    ]
    lr = 5e-4

    tleaves = [
        torch.tensor(p, requires_grad=True)
        for p in jax.tree_util.tree_leaves(params)
    ]
    topt = torch.optim.Adam(
        tleaves, lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-4
    )

    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    tx = make_optimizer(1e-4)
    opt_state = tx.init(jparams)
    for g in grads_seq:
        jg = jax.tree_util.tree_map(jnp.asarray, g)
        updates, opt_state = tx.update(jg, opt_state, jparams)
        jparams = optax.apply_updates(
            jparams, jax.tree_util.tree_map(lambda u: -lr * u, updates)
        )
        for t, gl in zip(tleaves, jax.tree_util.tree_leaves(g)):
            t.grad = torch.tensor(gl)
        topt.step()

    for j, t in zip(jax.tree_util.tree_leaves(jparams), tleaves):
        np.testing.assert_allclose(
            np.asarray(j), t.detach().numpy(), rtol=1e-5, atol=1e-6
        )


def test_train_steps_match_torch_reference_loop(tmp_path):
    """K train steps: fenet Trainer vs the reference torch loop (same
    converted init, same data/LR/loss composition 100*CD + 100*EMD,
    train.py:137-189) — per-step CD/EMD losses and the final parameters
    must track.

    The torch loop runs in a SUBPROCESS (torch_ref_loop.py): torch autograd
    and XLA:CPU corrupt the glibc heap when interleaved in one process on
    this image. Its EMD term uses the fenet auction's recorded ASSIGNMENTS
    (computed on the fenet predictions, which must equal the torch ones if
    training matches) and differentiates the matched distances with torch
    autograd — the identical gradient contract to the reference CUDA op
    (gradient to pred through a fixed assignment, emd_cuda.cu:284-300). Any
    per-step loss divergence therefore isolates a fenet optimizer/grad/
    BN-wiring bug rather than an assignment tie."""
    import json
    import subprocess

    torch.manual_seed(0)
    n, b, steps, fw, mw = 256, 2, 3, 32, 16
    emd_eps, emd_iters = 0.05, 300
    bb_cfg = REPVGG_CONFIGS["RepVGG-TEST"]

    tgen = _TorchGenerator(bb_cfg, num_points=n, fine_width=fw, mid_width=mw)
    state_dict = {k: v.detach().numpy().copy()
                  for k, v in tgen.state_dict().items()}
    variables = torch_state_dict_to_variables(tgen.state_dict())
    del tgen  # no torch compute in this process beyond init

    gen = Generator(num_points=n, backbone="RepVGG-TEST", fine_width=fw,
                    mid_width=mw)
    init_vars = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    merged = {
        "params": merge_variables(init_vars["params"], variables["params"]),
        "batch_stats": merge_variables(
            init_vars["batch_stats"], variables["batch_stats"]
        ),
    }
    cfg = TrainConfig(
        batch_size=b, num_points=n, emd_eps=emd_eps, emd_iters=emd_iters,
        backbone="RepVGG-TEST", fine_width=fw, mid_width=mw,
        data_parallel=1,
    )
    trainer = Trainer(gen, cfg)
    state = trainer.state_from_variables(merged)

    # Forward at the current params (train-mode BN, matching the in-step
    # forward) to record the auction assignment the torch loop will reuse.
    @jax.jit
    def fwd(params, batch_stats, img):
        (_, _, pc3), _ = gen.apply(
            {"params": params, "batch_stats": batch_stats}, img,
            train=True, mutable=["batch_stats"],
        )
        return pc3

    rng = np.random.RandomState(1)
    lr = reference_lr_schedule(cfg.lr, 1)
    imgs, ptss, assignments, fenet_hist = [], [], [], []
    for step in range(steps):
        img = (rng.rand(b, 128, 128, 3) * 255).astype(np.float32)
        pts = (rng.rand(b, n, 3) * 0.9).astype(np.float32)
        pc3 = fwd(state.params, state.batch_stats, jnp.asarray(img))
        _, ass = earth_mover_distance(pc3, jnp.asarray(pts), emd_eps,
                                      emd_iters)
        imgs.append(img)
        ptss.append(pts)
        assignments.append(np.asarray(ass).copy())
        state, stats = trainer.train_step(
            state, jnp.asarray(img), jnp.asarray(pts), epoch=1, lr=lr
        )
        fenet_hist.append(
            (float(stats["chamfer_loss"]), float(stats["emd_loss"]))
        )

    in_npz = str(tmp_path / "ref_in.npz")
    out_json = str(tmp_path / "ref_out.json")
    np.savez(
        in_npz,
        imgs=np.stack(imgs), pts=np.stack(ptss),
        assignments=np.stack(assignments),
        num_points=n, fine_width=fw, mid_width=mw, lr=lr,
        num_blocks=np.asarray(bb_cfg.num_blocks),
        width_multiplier=np.asarray(bb_cfg.width_multiplier),
        **{f"sd.{k}": v for k, v in state_dict.items()},
    )
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        [sys.executable, os.path.join(here, "torch_ref_loop.py"),
         in_npz, out_json],
        check=True, cwd=here, timeout=600,
    )
    with open(out_json) as f:
        torch_hist = json.load(f)

    for step, ((j_cd, j_emd), t) in enumerate(zip(fenet_hist, torch_hist)):
        tol = 5e-3 * (step + 1)  # fp32 accumulation compounds per step
        np.testing.assert_allclose(
            j_cd, t["cd"], rtol=tol, err_msg=f"CD diverged at step {step}"
        )
        np.testing.assert_allclose(
            j_emd, t["emd"], rtol=tol,
            err_msg=f"EMD diverged at step {step}",
        )

    # Parameters themselves must still track after K optimizer steps.
    j_fc3_1 = np.asarray(state.params["decoder"]["fc3_1"]["kernel"])
    t_fc3_1 = np.load(out_json + ".fc3_1.npy")
    np.testing.assert_allclose(j_fc3_1, t_fc3_1, rtol=5e-2, atol=5e-4)


def test_finetune_steps_match_torch_reference_loop(tmp_path):
    """K finetune steps (loss_mode='finetune'): fenet Trainer vs the torch
    reference loop with the projection loss made differentiable the same
    way (torch_ref_finetune_loop.py) — per-step bce/CD/EMD losses and the
    final parameters must track. Mirrors
    test_train_steps_match_torch_reference_loop for finetune.py:141-182."""
    import json
    import subprocess

    torch.manual_seed(0)
    n, b, steps, fw, mw = 256, 2, 3, 32, 16
    emd_eps, emd_iters = 0.05, 300
    grid_h = grid_w = 64
    sigma_sq = 2.0
    bb_cfg = REPVGG_CONFIGS["RepVGG-TEST"]

    tgen = _TorchGenerator(bb_cfg, num_points=n, fine_width=fw, mid_width=mw)
    state_dict = {k: v.detach().numpy().copy()
                  for k, v in tgen.state_dict().items()}
    variables = torch_state_dict_to_variables(tgen.state_dict())
    del tgen

    gen = Generator(num_points=n, backbone="RepVGG-TEST", fine_width=fw,
                    mid_width=mw)
    init_vars = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    merged = {
        "params": merge_variables(init_vars["params"], variables["params"]),
        "batch_stats": merge_variables(
            init_vars["batch_stats"], variables["batch_stats"]
        ),
    }
    cfg = TrainConfig(
        batch_size=b, num_points=n, emd_eps=emd_eps, emd_iters=emd_iters,
        backbone="RepVGG-TEST", fine_width=fw, mid_width=mw,
        data_parallel=1, grid_h=grid_h, grid_w=grid_w, sigma_sq=sigma_sq,
    )
    trainer = Trainer(gen, cfg, loss_mode="finetune")
    state = trainer.state_from_variables(merged)

    @jax.jit
    def fwd(params, batch_stats, img):
        (_, _, pc3), _ = gen.apply(
            {"params": params, "batch_stats": batch_stats}, img,
            train=True, mutable=["batch_stats"],
        )
        return pc3

    rng = np.random.RandomState(1)
    lr = 5e-5  # finetune.py's LR (finetune.py:111-113 semantics)
    imgs, ptss, assignments, fenet_hist = [], [], [], []
    for step in range(steps):
        img = (rng.rand(b, 128, 128, 3) * 255).astype(np.float32)
        pts = (rng.rand(b, n, 3) * 0.9).astype(np.float32)
        pc3 = fwd(state.params, state.batch_stats, jnp.asarray(img))
        _, ass = earth_mover_distance(pc3, jnp.asarray(pts), emd_eps,
                                      emd_iters)
        imgs.append(img)
        ptss.append(pts)
        assignments.append(np.asarray(ass).copy())
        state, stats = trainer.train_step(
            state, jnp.asarray(img), jnp.asarray(pts), epoch=1, lr=lr
        )
        fenet_hist.append(
            (float(stats["total_loss"]), float(stats["chamfer_loss"]),
             float(stats["emd_loss"]))
        )

    in_npz = str(tmp_path / "ft_in.npz")
    out_json = str(tmp_path / "ft_out.json")
    np.savez(
        in_npz,
        imgs=np.stack(imgs), pts=np.stack(ptss),
        assignments=np.stack(assignments),
        num_points=n, fine_width=fw, mid_width=mw, lr=lr,
        grid_h=grid_h, grid_w=grid_w, sigma_sq=sigma_sq,
        num_blocks=np.asarray(bb_cfg.num_blocks),
        width_multiplier=np.asarray(bb_cfg.width_multiplier),
        **{f"sd.{k}": v for k, v in state_dict.items()},
    )
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        [sys.executable, os.path.join(here, "torch_ref_finetune_loop.py"),
         in_npz, out_json],
        check=True, cwd=here, timeout=600,
    )
    with open(out_json) as f:
        torch_hist = json.load(f)

    for step, ((j_tot, j_cd, j_emd), t) in enumerate(
        zip(fenet_hist, torch_hist)
    ):
        tol = 5e-3 * (step + 1)  # fp32 accumulation compounds per step
        np.testing.assert_allclose(
            j_cd, t["cd"], rtol=tol, err_msg=f"CD diverged at step {step}"
        )
        np.testing.assert_allclose(
            j_emd, t["emd"], rtol=tol,
            err_msg=f"EMD diverged at step {step}",
        )
        np.testing.assert_allclose(
            j_tot, t["total"], rtol=tol,
            err_msg=f"total (incl. bce) diverged at step {step}",
        )

    j_fc3_1 = np.asarray(state.params["decoder"]["fc3_1"]["kernel"])
    t_fc3_1 = np.load(out_json + ".fc3_1.npy")
    np.testing.assert_allclose(j_fc3_1, t_fc3_1, rtol=5e-2, atol=5e-4)


def test_adaptive_scaling_training_equivalence():
    """PARITY.md #10's end-to-end evidence: a short training run under
    adaptive epsilon-scaling (--emd_scale_phases 3, thresh 0.3) reaches
    the same losses as strict reference mode (phases=1) from the same
    init on the same data — the op-level eps-optimality argument holds
    through actual optimization, not just on a frozen batch."""
    n, b, steps = 256, 4, 6

    def run(scale_phases, scale_thresh):
        cfg = TrainConfig(
            batch_size=b, num_points=n, emd_eps=0.05, emd_iters=500,
            backbone="RepVGG-TEST", fine_width=32, mid_width=16,
            data_parallel=1, emd_scale_phases=scale_phases,
            emd_scale_thresh=scale_thresh,
        )
        gen = Generator(num_points=n, backbone="RepVGG-TEST",
                        fine_width=32, mid_width=16)
        trainer = Trainer(gen, cfg)
        state = trainer.init_state(
            jax.random.PRNGKey(7), np.zeros((1, 128, 128, 3), np.float32)
        )
        rng = np.random.RandomState(3)
        history = []
        for _ in range(steps):
            img = (rng.rand(b, 128, 128, 3) * 255).astype(np.float32)
            pts = (rng.rand(b, n, 3) * 0.9).astype(np.float32)
            state, stats = trainer.train_step(
                state, jnp.asarray(img), jnp.asarray(pts), epoch=1,
                lr=5e-4,
            )
            history.append(
                (float(stats["chamfer_loss"]), float(stats["emd_loss"]))
            )
        return history

    strict = run(1, 0.0)
    adaptive = run(3, 0.3)

    # Final-step losses within a few percent (identical data order; the
    # only difference is which eps path the auction takes per element).
    for k, name in ((0, "chamfer"), (1, "emd")):
        s, a = strict[-1][k], adaptive[-1][k]
        assert abs(s - a) / max(abs(s), 1e-6) < 0.05, (
            f"{name} loss diverged: strict={s} adaptive={a}\n"
            f"strict hist={strict}\nadaptive hist={adaptive}"
        )
    # Both runs must actually be optimizing (loss decreasing).
    assert strict[-1][1] < strict[0][1]
    assert adaptive[-1][1] < adaptive[0][1]


def test_sinkhorn_training_mode_tracks_auction():
    """--emd_impl sinkhorn end-to-end evidence: a short training run with
    the annealed Sinkhorn EMD from the same init on the same data optimizes
    the same objective as the auction — losses finite and decreasing, and
    the final CD/EMD land close to the auction run's (the op-level
    LAP-equality tests bound the loss semantics; this checks nothing breaks
    through actual optimization: gradients, BN mutation, Adam)."""
    n, b, steps = 256, 4, 6

    def run(emd_impl):
        cfg = TrainConfig(
            batch_size=b, num_points=n, emd_eps=0.05, emd_iters=500,
            backbone="RepVGG-TEST", fine_width=32, mid_width=16,
            data_parallel=1, emd_impl=emd_impl,
        )
        gen = Generator(num_points=n, backbone="RepVGG-TEST",
                        fine_width=32, mid_width=16)
        trainer = Trainer(gen, cfg)
        state = trainer.init_state(
            jax.random.PRNGKey(7), np.zeros((1, 128, 128, 3), np.float32)
        )
        rng = np.random.RandomState(3)
        history = []
        for _ in range(steps):
            img = (rng.rand(b, 128, 128, 3) * 255).astype(np.float32)
            pts = (rng.rand(b, n, 3) * 0.9).astype(np.float32)
            state, stats = trainer.train_step(
                state, jnp.asarray(img), jnp.asarray(pts), epoch=1,
                lr=5e-4,
            )
            history.append(
                (float(stats["chamfer_loss"]), float(stats["emd_loss"]))
            )
        return history

    auction = run("auction")
    sinkhorn = run("sinkhorn")

    assert all(np.isfinite(v) for h in sinkhorn for v in h)
    assert sinkhorn[-1][1] < sinkhorn[0][1]  # optimizing
    for k, name in ((0, "chamfer"), (1, "emd")):
        a, s = auction[-1][k], sinkhorn[-1][k]
        assert abs(s - a) / max(abs(a), 1e-6) < 0.15, (
            f"{name} diverged: auction={a} sinkhorn={s}\n"
            f"auction hist={auction}\nsinkhorn hist={sinkhorn}"
        )


def test_sinkhorn_mode_matches_across_dp_mesh():
    """--emd_impl sinkhorn under shard_map: a dp=2 step must reproduce the
    dp=1 step's losses (per-sample loss terms + pmean == global mean), so
    the mode composes with the parallel layer like the auction does."""
    from fenet.parallel.mesh import make_mesh, shard_batch

    n, b = 256, 4
    rng = np.random.RandomState(8)
    images = rng.rand(b, 128, 128, 3).astype(np.float32) * 255
    points = (rng.rand(b, n, 3) * 0.9).astype(np.float32)

    def run(dp):
        cfg = TrainConfig(
            batch_size=b, num_points=n, backbone="RepVGG-TEST",
            fine_width=32, mid_width=16, data_parallel=dp,
            emd_impl="sinkhorn", sinkhorn_iters=60,
        )
        gen = Generator(num_points=n, backbone="RepVGG-TEST",
                        fine_width=32, mid_width=16)
        mesh = make_mesh(dp)
        trainer = Trainer(gen, cfg, mesh=mesh)
        state = trainer.init_state(
            jax.random.PRNGKey(7), np.zeros((1, 128, 128, 3), np.float32)
        )
        sh = shard_batch({"i": images, "p": points}, mesh)
        _, stats = trainer.train_step(state, sh["i"], sh["p"], epoch=1,
                                      lr=5e-4)
        return {k: float(v) for k, v in stats.items()}

    one = run(1)
    two = run(2)
    # sync_bn (the default) normalizes with GLOBAL batch statistics at any
    # dp, so dp=2 matches dp=1 to reduction order. (With sync_bn=False the
    # per-replica BN statistics shift this by ~2%.)
    for k in one:
        np.testing.assert_allclose(two[k], one[k], rtol=2e-4, err_msg=k)
