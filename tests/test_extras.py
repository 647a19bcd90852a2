"""Sinkhorn EMD, custom L2, point-loss helpers, progress meter, accuracy."""

import jax
import jax.numpy as jnp
import numpy as np

from fenet.losses.facade import point_loss, point_loss_test
from fenet.losses.sinkhorn import batch_emd_loss, sinkhorn_distance
from fenet.models.repvgg import RepVGGBlock, model_custom_l2
from fenet.utils.average_meter import AverageMeter, ProgressMeter, accuracy


def test_sinkhorn_zero_for_identical_and_positive():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    y = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    same = sinkhorn_distance(x, x, blur=0.05, iters=100)
    diff = sinkhorn_distance(x, y, blur=0.05, iters=100)
    assert float(jnp.max(same)) < 0.05
    assert (np.asarray(diff) > np.asarray(same)).all()
    # differentiable
    g = jax.grad(lambda a: batch_emd_loss(a, y, 0.05, 20))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_sinkhorn_approaches_true_ot():
    """Small blur -> near the exact Hungarian cost."""
    import scipy.optimize

    rng = np.random.RandomState(1)
    x = rng.rand(1, 32, 3).astype(np.float32)
    y = rng.rand(1, 32, 3).astype(np.float32)
    got = float(sinkhorn_distance(jnp.asarray(x), jnp.asarray(y),
                                  blur=0.03, iters=500)[0])
    c = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
    ri, ci = scipy.optimize.linear_sum_assignment(c)
    exact = c[ri, ci].mean()
    assert abs(got - exact) < 0.3 * exact + 0.01, (got, exact)


def test_custom_l2_positive_and_differentiable():
    x = jnp.zeros((1, 8, 8, 16))
    block = RepVGGBlock(16)
    variables = block.init(jax.random.PRNGKey(0), x, train=False)
    l2 = model_custom_l2(variables["params"], variables["batch_stats"])
    assert float(l2) > 0
    g = jax.grad(
        lambda p: model_custom_l2(p, variables["batch_stats"])
    )(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_point_loss_helpers():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    b = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    pl = float(point_loss(a, b))
    total, d1, d2 = point_loss_test(a, b)
    np.testing.assert_allclose(pl, 50 * float(d1) + 50 * float(d2), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(d1) + float(d2), rtol=1e-5)


def test_progress_meter_and_accuracy(capsys):
    m = AverageMeter()
    m.update(1.0)
    pm = ProgressMeter(10, [m], prefix="ep1 ")
    pm.display(3)
    assert "ep1" in capsys.readouterr().out
    out = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    tgt = np.array([1, 2])
    top1, top2 = accuracy(out, tgt, topk=(1, 2))
    assert top1 == 50.0 and top2 == 50.0


def test_cli_parallelism_flags_reach_config():
    """--data_parallel/--model_parallel flow into TrainConfig (cli/common.py)."""
    import argparse

    from fenet.cli.common import add_common_args, config_from_args

    parser = add_common_args(argparse.ArgumentParser())
    opt = parser.parse_args(
        ["--data_parallel", "4", "--model_parallel", "2", "--num_points",
         "2048"]
    )
    cfg = config_from_args(opt)
    assert cfg.data_parallel == 4
    assert cfg.model_parallel == 2
    assert cfg.num_points == 2048


def test_export_deploy_cli_roundtrip(tmp_path):
    """export_deploy writes the folded serving checkpoint + sidecar;
    load_deploy_checkpoint rebuilds the module and reproduces the branched
    eval-mode forward exactly (the fold itself is exactness-tested in
    test_deploy.py — this covers the on-disk roundtrip and the CLI)."""
    import os

    from fenet.cli.export_deploy import load_deploy_checkpoint, main
    from fenet.models.generator import Generator
    from fenet.train.checkpoint import save_checkpoint

    gen = Generator(num_points=256, backbone="RepVGG-TEST",
                    fine_width=32, mid_width=16)
    rng = np.random.RandomState(0)
    img = rng.rand(2, 128, 128, 3).astype(np.float32) * 255
    variables = gen.init(jax.random.PRNGKey(1), img[:1], train=False)
    ckpt_dir = str(tmp_path)
    save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"], "epoch": 1},
        True, "t", ckpt_dir, 1,
    )
    out = main([
        "--model", ckpt_dir, "--backbone", "RepVGG-TEST",
        "--num_points", "256", "--fine_width", "32", "--mid_width", "16",
    ])
    assert os.path.exists(out) and os.path.exists(out + ".json")
    dep_gen, dep_vars, dtype = load_deploy_checkpoint(out)
    assert dtype == np.float32
    ref = gen.apply(variables, img, train=False)
    got = dep_gen.apply(dep_vars, img, train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-3)


def test_export_deploy_cli_bf16(tmp_path):
    """--dtype bfloat16 export: sidecar records the dtype, the loader
    restores bf16 leaves, and the bf16 forward tracks the fp32 fold within
    bf16 rounding (the to_deploy docstring's ~1e-2 relative claim)."""
    import os

    import jax.numpy as jnp

    from fenet.cli.export_deploy import load_deploy_checkpoint, main
    from fenet.models.generator import Generator, to_deploy
    from fenet.train.checkpoint import save_checkpoint

    gen = Generator(num_points=256, backbone="RepVGG-TEST",
                    fine_width=32, mid_width=16)
    rng = np.random.RandomState(3)
    img = rng.rand(2, 128, 128, 3).astype(np.float32) * 255
    variables = gen.init(jax.random.PRNGKey(1), img[:1], train=False)
    ckpt_dir = str(tmp_path)
    save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"], "epoch": 1},
        True, "t", ckpt_dir, 1,
    )
    out = main([
        "--model", ckpt_dir, "--backbone", "RepVGG-TEST",
        "--num_points", "256", "--fine_width", "32", "--mid_width", "16",
        "--dtype", "bfloat16",
    ])
    assert os.path.exists(out + ".json")
    dep_gen, dep_vars, dtype = load_deploy_checkpoint(out)
    assert dtype == jnp.bfloat16
    leaves = jax.tree_util.tree_leaves(dep_vars)
    assert all(leaf.dtype == jnp.bfloat16 for leaf in leaves)
    # fp32 fold as the oracle; inputs must be cast to the serving dtype.
    _, fp32_vars = to_deploy(gen, variables)
    ref = np.asarray(dep_gen.apply(fp32_vars, img, train=False)[2])
    got16 = dep_gen.apply(dep_vars, img.astype(jnp.bfloat16), train=False)[2]
    assert got16.dtype == jnp.bfloat16
    got = np.asarray(got16.astype(jnp.float32))
    assert np.all(np.isfinite(got))
    # Coordinates live in a data-dependent range; compare against the
    # cloud's scale, not elementwise (bf16 ~8-bit mantissa through ~20
    # layers accumulates to the 1e-2 relative level).
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(got - ref).max() / scale < 0.05


def test_predict_cli_serves_deploy_artifact(tmp_path):
    """fenet.cli.predict closes the export->serve loop: it consumes the
    exported artifact (bf16 here — the sidecar's dtype drives the forward),
    batches arbitrary-size images with last-batch padding under ONE
    compiled program, and writes one finite PLY cloud per input."""
    import os

    import cv2
    import jax.numpy as jnp

    from fenet.cli.export_deploy import main as export_main
    from fenet.cli.predict import main as predict_main
    from fenet.models.generator import Generator
    from fenet.train.checkpoint import save_checkpoint
    from fenet.utils.ply import load_pointcloud

    gen = Generator(num_points=256, backbone="RepVGG-TEST",
                    fine_width=32, mid_width=16)
    rng = np.random.RandomState(7)
    variables = gen.init(
        jax.random.PRNGKey(1),
        rng.rand(1, 128, 128, 3).astype(np.float32), train=False,
    )
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(ckpt_dir)
    save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"], "epoch": 1},
        True, "t", ckpt_dir, 1,
    )
    artifact = export_main([
        "--model", ckpt_dir, "--backbone", "RepVGG-TEST",
        "--num_points", "256", "--fine_width", "32", "--mid_width", "16",
        "--dtype", "bfloat16",
        "--out", str(tmp_path / "deploy.ckpt"),
    ])
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    # 3 images, 2 sizes: a 137x137 "ShapeNet render" (gets the reference
    # crop) and off-size inputs (get resized) — batchSize 2 forces a
    # padded final batch.
    for i, side in enumerate((137, 64, 200)):
        cv2.imwrite(str(img_dir / f"im{i}.png"),
                    rng.randint(0, 256, (side, side, 3), np.uint8))
    # Same stem, different extension: the .ply names must not collide.
    cv2.imwrite(str(img_dir / "im1.jpg"),
                rng.randint(0, 256, (64, 64, 3), np.uint8))
    written = predict_main([
        "--deploy_ckpt", artifact, "--images", str(img_dir),
        "--out_dir", str(tmp_path / "out"), "--batchSize", "2",
    ])
    assert len(written) == 4
    assert len(set(written)) == 4  # unique output files, no overwrite
    for ply in written:
        cloud = load_pointcloud(ply)
        assert cloud.shape == (256, 3)
        assert np.all(np.isfinite(cloud))
    # The written cloud matches a direct forward at the artifact dtype.
    img = cv2.cvtColor(cv2.imread(str(img_dir / "im0.png")),
                       cv2.COLOR_BGR2RGB)[4:-5, 4:-5].astype(np.float32)
    from fenet.cli.export_deploy import load_deploy_checkpoint

    dep_gen, dep_vars, dtype = load_deploy_checkpoint(artifact)
    assert dtype == jnp.bfloat16
    ref = np.asarray(
        dep_gen.apply(dep_vars, img[None].astype(dtype), train=False)[2][0],
        np.float32,
    )
    got = load_pointcloud(written[0])
    # Batched (padded) vs single-image forward fuses differently ->
    # one-ulp bf16 deltas on O(100) coordinates; compare to cloud scale.
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(got - ref).max() / scale < 3e-3


def test_sinkhorn_emd_loss_reaches_lap_optimum():
    """--emd_impl sinkhorn quality: the annealed detached-plan Sinkhorn
    loss reaches the EXACT LAP optimum's mean matched distance (same
    semantics as the auction loss: mean over points of sqrt matched
    squared distance), and the auction lands within its eps-suboptimality
    of the same number."""
    import scipy.optimize

    from fenet.losses.facade import emd_loss
    from fenet.losses.sinkhorn import sinkhorn_emd_loss

    rng = np.random.RandomState(11)
    x = rng.rand(2, 64, 3).astype(np.float32)
    y = rng.rand(2, 64, 3).astype(np.float32)

    sk = float(sinkhorn_emd_loss(jnp.asarray(x), jnp.asarray(y),
                                 blur=0.01, iters=300))
    auction = float(emd_loss(jnp.asarray(x), jnp.asarray(y), 0.002, 5000))
    lap = []
    for b in range(2):
        c = ((x[b][:, None] - y[b][None]) ** 2).sum(-1)
        ri, ci = scipy.optimize.linear_sum_assignment(c)
        lap.append(np.sqrt(c[ri, ci]).mean())
    lap = float(np.mean(lap))
    assert abs(auction - lap) / lap < 0.05, (auction, lap)
    assert abs(sk - lap) / lap < 0.005, (sk, lap)  # annealed = near-exact


def test_sinkhorn_emd_loss_gradient_matches_lap_direction():
    """The detached-plan gradient (the auction backward's rule applied to
    the soft plan) must match the gradient of the loss under the EXACT
    LAP assignment once the plan sharpens to a permutation. (The auction's
    own gradient is NOT the oracle here: at eps=0.002 it matches the LAP
    permutation on only ~2/3 of near-tie points, so auction-vs-anything
    cosines plateau around 0.75-0.8 without being wrong.)"""
    import scipy.optimize

    from fenet.losses.sinkhorn import sinkhorn_emd_loss

    rng = np.random.RandomState(5)
    xn = rng.rand(2, 64, 3).astype(np.float32)
    yn = rng.rand(2, 64, 3).astype(np.float32)
    x, y = jnp.asarray(xn), jnp.asarray(yn)

    g_sk = np.asarray(jax.grad(
        lambda p: sinkhorn_emd_loss(p, y, blur=0.01, iters=300)
    )(x)).ravel()
    assert np.isfinite(g_sk).all()

    # d/dx_i mean_i sqrt(||x_i - y_p(i)||^2) under the LAP permutation.
    g_lap = np.zeros_like(xn)
    for b in range(2):
        c = ((xn[b][:, None] - yn[b][None]) ** 2).sum(-1)
        ri, ci = scipy.optimize.linear_sum_assignment(c)
        perm = np.empty(64, int)
        perm[ri] = ci
        d = xn[b] - yn[b][perm]
        g_lap[b] = d / np.linalg.norm(d, axis=-1, keepdims=True)
    g_lap = g_lap.ravel()
    cos = float(
        (g_sk @ g_lap) / (np.linalg.norm(g_sk) * np.linalg.norm(g_lap))
    )
    assert cos > 0.99, cos


def test_sinkhorn_pallas_kernel_matches_xla_loop():
    """The VMEM-resident Pallas potentials kernel (interpret mode here)
    must reproduce the XLA fori_loop's annealed potentials — same
    iteration-by-iteration math, different residency."""
    from fenet.losses import sinkhorn as sk
    from fenet.ops.pairwise import pairwise_sqdist
    from fenet.ops.sinkhorn import sinkhorn_potentials

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    eps, iters = 1e-4, 150

    c0 = pairwise_sqdist(x, y)
    # On the CPU test backend _potentials always takes the XLA loop.
    f_ref, g_ref = sk._potentials(x, y, c0, eps, iters, 0.25)
    f_k, g_k = sinkhorn_potentials(x, y, eps, iters, 0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_sinkhorn_stream_kernel_matches_xla_loop():
    """The streaming potentials kernel (row-chunk cost recompute + running
    (max, sum) LSE accumulation for the g update) must reproduce the XLA
    loop exactly — it lifts the resident kernel's N<=1024 VMEM cap to 8192
    (the ops/emd.py streaming design)."""
    from fenet.losses import sinkhorn as sk
    from fenet.ops.pairwise import pairwise_sqdist
    from fenet.ops.sinkhorn import sinkhorn_potentials_stream

    rng = np.random.RandomState(12)
    # N=512 = 2 chunks of 256: exercises the cross-chunk accumulation.
    x = jnp.asarray(rng.rand(1, 512, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 512, 3).astype(np.float32))
    eps, iters = 1e-4, 120

    c0 = pairwise_sqdist(x, y)
    f_ref, g_ref = sk._potentials(x, y, c0, eps, iters, 0.25)
    f_k, g_k = sinkhorn_potentials_stream(x, y, eps, iters, 0.25,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
