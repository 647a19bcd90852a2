"""End-to-end integration: train_net on a synthetic on-disk ShapeNet tree,
then the eval / render / prep CLIs against its outputs — the full minimum
slice of SURVEY.md §7.5 on the 8-device CPU mesh."""

import os

import numpy as np
import pytest

from fenet.data.synthetic import SyntheticShapeNet, write_synthetic_shapenet
from fenet.train.config import TrainConfig
from fenet.train.driver import train_net

CAT = "02691156"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    write_synthetic_shapenet(root, cats=(CAT,), models_per_cat=1)
    return root


@pytest.fixture(scope="module")
def trained(workdir):
    cfg = TrainConfig(
        batch_size=8,
        nepoch=1,
        validate_epochs=(1,),
        lr=1e-3,
        emd_iters=5,
        eval_icp_iterations=8,
        eval_emd_iters=5,
        backbone="RepVGG-TEST",
        # Width-scaled decoder: structure-identical cascade at a fraction of
        # the default 134M-param fc1_1 — the full-width decoder cost this
        # suite ~25s per checkpoint save and ~60s per resume load on the
        # 1-core sandbox. Full-width coverage lives in the parity tests
        # (test_torch_parity, test_reference_parity).
        fine_width=32,
        mid_width=16,
        # 2-device mesh: same shard_map/pmean semantics as 8 at ~1/8 the
        # single-core emulation cost; 8-device coverage lives in
        # test_train_step_full_8dev_mesh + the driver's dryrun_multichip.
        data_parallel=2,
        manual_seed=3,
        dir_path=os.path.join(workdir, "output") + "/",
        splits_path=os.path.join(workdir, "splits"),
        data_dir_imgs=os.path.join(workdir, "ShapeNetRendering") + "/",
        data_dir_pcl=os.path.join(workdir, "ShapeNet_pointclouds") + "/",
    )
    return train_net(CAT, cfg), cfg


def test_train_net_end_to_end(trained):
    result, cfg = trained
    ckpt_dir = result["ckpt_dir"]
    assert os.path.exists(os.path.join(ckpt_dir, f"{CAT}_checkpoint_1.ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, "model_best.ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, "logging.log"))
    hist = result["history"]
    assert len(hist) == 1 and np.isfinite(hist[0]["chamfer_loss"])
    assert "val" in hist[0] and hist[0]["val"]["samples"] == 24


def test_eval_cli_on_trained_checkpoint(workdir, trained):
    from fenet.cli.eval_shapenet import main

    results = main([
        "--model", os.path.join(workdir, "output", "%s", "checkpoints") + "/",
        "--splits_path", os.path.join(workdir, "splits"),
        "--data_dir_imgs", os.path.join(workdir, "ShapeNetRendering") + "/",
        "--data_dir_pcl", os.path.join(workdir, "ShapeNet_pointclouds") + "/",
        "--backbone", "RepVGG-TEST",
        "--fine_width", "32", "--mid_width", "16",
        "--batchSize", "16",
        "--icp_iters", "8",
        "--emd_iters", "5",
        "--cats", CAT,
    ])
    assert CAT in results
    assert results[CAT]["samples"] == 24
    assert np.isfinite(results[CAT]["ChamferDistance"])


def test_resume_from_checkpoint(workdir, trained):
    _, cfg = trained
    cfg2 = TrainConfig(**{**cfg.__dict__, "resume": True, "nepoch": 2,
                          "validate_epochs": ()})
    result = train_net(CAT, cfg2)
    assert result["history"][0]["epoch"] == 2  # continued after epoch 1


def test_periodic_checkpoint_resumable_without_val(workdir, trained):
    """--train_save_freq checkpoints must (a) fire even with no val split
    (the reference's dead flag, wired here), and (b) be resumable: with no
    model_best on disk, --resume falls back to the newest periodic
    checkpoint instead of raising."""
    _, cfg = trained
    out = os.path.join(workdir, "periodic_out") + "/"
    cfg1 = TrainConfig(**{**cfg.__dict__, "dir_path": out,
                          "validate_epochs": (1,), "train_save_freq": 1})
    ds = SyntheticShapeNet(n_models=1, num_points=cfg.num_points)
    r1 = train_net(CAT, cfg1, train_ds=ds, val_ds=EmptyDS())
    ckpt_dir = r1["ckpt_dir"]
    assert os.path.exists(os.path.join(ckpt_dir, f"{CAT}_checkpoint_1.ckpt"))
    assert not os.path.exists(os.path.join(ckpt_dir, "model_best.ckpt"))
    cfg2 = TrainConfig(**{**cfg1.__dict__, "resume": True, "nepoch": 2})
    r2 = train_net(CAT, cfg2, train_ds=ds, val_ds=EmptyDS())
    assert r2["history"][0]["epoch"] == 2  # resumed past epoch 1


def test_resume_prefers_newer_periodic_over_older_best(workdir, trained):
    """A periodic checkpoint from AFTER the last validate epoch must win
    over model_best on --resume, or the crash-after-validate case silently
    redoes up to train_save_freq epochs."""
    _, cfg = trained
    out = os.path.join(workdir, "newer_periodic_out") + "/"
    ds = SyntheticShapeNet(n_models=1, num_points=cfg.num_points)
    # validate at epoch 1 -> model_best(epoch 1); periodic at epoch 2.
    cfg1 = TrainConfig(**{**cfg.__dict__, "dir_path": out, "nepoch": 2,
                          "validate_epochs": (1,), "train_save_freq": 2})
    r1 = train_net(CAT, cfg1, train_ds=ds, val_ds=ds)
    ckpt_dir = r1["ckpt_dir"]
    assert os.path.exists(os.path.join(ckpt_dir, "model_best.ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, f"{CAT}_checkpoint_2.ckpt"))
    cfg2 = TrainConfig(**{**cfg1.__dict__, "resume": True, "nepoch": 3,
                          "validate_epochs": ()})
    r2 = train_net(CAT, cfg2, train_ds=ds, val_ds=EmptyDS())
    assert r2["history"][0]["epoch"] == 3  # resumed from epoch 2, not 1


class EmptyDS:
    def __len__(self):
        return 0

    def __getitem__(self, i):
        raise IndexError(i)


def test_render_cli(workdir, trained):
    from fenet.cli.render import main

    out_dir = os.path.join(workdir, "renders")
    main([
        "--category", CAT,
        "--model", os.path.join(workdir, "output", "%s", "checkpoints") + "/",
        "--splits_path", os.path.join(workdir, "splits"),
        "--data_dir_imgs", os.path.join(workdir, "ShapeNetRendering") + "/",
        "--data_dir_pcl", os.path.join(workdir, "ShapeNet_pointclouds") + "/",
        "--backbone", "RepVGG-TEST",
        "--fine_width", "32", "--mid_width", "16",
        "--out_dir", out_dir,
        "--n_samples", "1",
    ])
    assert os.path.exists(os.path.join(out_dir, f"{CAT}_000.png"))

    # --deploy folds BN + branches at load (repvgg_model_convert equivalent)
    # and must drive the same render path.
    dep_dir = os.path.join(workdir, "renders_deploy")
    main([
        "--category", CAT,
        "--model", os.path.join(workdir, "output", "%s", "checkpoints") + "/",
        "--splits_path", os.path.join(workdir, "splits"),
        "--data_dir_imgs", os.path.join(workdir, "ShapeNetRendering") + "/",
        "--data_dir_pcl", os.path.join(workdir, "ShapeNet_pointclouds") + "/",
        "--backbone", "RepVGG-TEST",
        "--fine_width", "32", "--mid_width", "16",
        "--out_dir", dep_dir,
        "--n_samples", "1",
        "--deploy",
    ])
    assert os.path.exists(os.path.join(dep_dir, f"{CAT}_000.png"))


def test_heatmap_cli(workdir, trained):
    """Grad-CAM overlay PNGs from the heatmap CLI against the trained
    checkpoint (models/heatmap.py driver equivalent)."""
    from fenet.cli.heatmap import main

    out_dir = os.path.join(workdir, "heatmaps")
    main([
        "--category", CAT,
        "--model", os.path.join(workdir, "output", "%s", "checkpoints") + "/",
        "--splits_path", os.path.join(workdir, "splits"),
        "--data_dir_imgs", os.path.join(workdir, "ShapeNetRendering") + "/",
        "--data_dir_pcl", os.path.join(workdir, "ShapeNet_pointclouds") + "/",
        "--backbone", "RepVGG-TEST",
        "--fine_width", "32", "--mid_width", "16",
        "--out_dir", out_dir,
        "--n_samples", "1",
    ])
    png = os.path.join(out_dir, f"{CAT}_000_cam.png")
    assert os.path.exists(png) and os.path.getsize(png) > 0

    # --layer routes the CAM to a chosen backbone block (suffixed output).
    main([
        "--category", CAT,
        "--model", os.path.join(workdir, "output", "%s", "checkpoints") + "/",
        "--splits_path", os.path.join(workdir, "splits"),
        "--data_dir_imgs", os.path.join(workdir, "ShapeNetRendering") + "/",
        "--data_dir_pcl", os.path.join(workdir, "ShapeNet_pointclouds") + "/",
        "--backbone", "RepVGG-TEST",
        "--fine_width", "32", "--mid_width", "16",
        "--out_dir", out_dir,
        "--n_samples", "1",
        "--layer", "stage2",
    ])
    png2 = os.path.join(out_dir, f"{CAT}_000_cam_stage2.png")
    assert os.path.exists(png2) and os.path.getsize(png2) > 0


def test_record_goldens_cli(workdir, trained):
    """Golden-recorder smoke: records the trained category, gracefully
    skips the 12 categories with no checkpoint/data, writes the JSON
    table (the real-ShapeNet runbook's pipeline, testnet.py:112-136)."""
    import json

    from fenet.cli.record_goldens import main

    out = os.path.join(workdir, "goldens.json")
    table = main([
        "--model", os.path.join(workdir, "output", "%s", "checkpoints") + "/",
        "--splits_path", os.path.join(workdir, "splits"),
        "--data_dir_imgs", os.path.join(workdir, "ShapeNetRendering") + "/",
        "--data_dir_pcl", os.path.join(workdir, "ShapeNet_pointclouds") + "/",
        "--backbone", "RepVGG-TEST",
        "--fine_width", "32", "--mid_width", "16",
        "--batchSize", "16",
        "--icp_iters", "8",
        "--emd_iters", "5",
        "--cats", CAT, "02828884",  # second category: nothing on disk
        "--out", out,
    ])
    assert os.path.exists(out)
    with open(out) as f:
        loaded = json.load(f)
    assert loaded["categories"][CAT]["samples"] == 24
    assert np.isfinite(loaded["categories"][CAT]["cd"])
    assert loaded["skipped"] == ["02828884"]
    assert loaded["mean_cd"] == loaded["categories"][CAT]["cd"]
    assert table["categories"][CAT] == loaded["categories"][CAT]


def test_prepare_data_cli(workdir):
    from fenet.cli.prepare_data import main

    main([
        "--splits_path", os.path.join(workdir, "splits"),
        "--data_dir_pcl", os.path.join(workdir, "ShapeNet_pointclouds") + "/",
        "--overwrite",
    ])


def test_gradcam_on_generator(trained):
    from fenet.viz.gradcam import grad_cam

    result, cfg = trained
    gen = result["model"]
    state = result["state"]
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    img = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
    cam = grad_cam(gen, variables, img)
    assert cam.shape == (128, 128)
    assert np.isfinite(cam).all() and cam.max() <= 1.0 + 1e-6

    # Chosen-layer CAMs (draw_CAM's user-chosen module, heatmap.py:43-80):
    # stage prefix, exact block name, and final all agree in output shape.
    cams = {}
    for layer in ("stage2", "stage3_0", None):
        c = grad_cam(gen, variables, img, layer=layer)
        assert c.shape == (128, 128), (layer, c.shape)
        assert np.isfinite(c).all() and c.max() <= 1.0 + 1e-6
        cams[layer] = c
    # An explicit final-block layer reproduces the default path exactly.
    names = gen.bind(variables).backbone_net.block_names()
    np.testing.assert_allclose(
        grad_cam(gen, variables, img, layer=names[-1]), cam, atol=1e-6
    )
    # Mid-layer CAM genuinely differs from the final one (different fmap).
    assert np.abs(cams["stage2"] - cam).max() > 1e-4

    with pytest.raises(ValueError):
        grad_cam(gen, variables, img, layer="nope")
