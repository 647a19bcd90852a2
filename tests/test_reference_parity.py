"""Parity against the ACTUAL reference code at /root/reference.

Round-1's strongest layout test compared fenet against this repo's own torch
re-implementation — a shared misreading of the reference would have passed
silently. These tests close that hole:

- ``test_real_reference_generator_parity``: imports the reference's
  ``models/repvgg_edge_nose_NEW_cmlp.py`` itself (``generator`` at :210-336,
  the flagship RepVGG-A2 config at :349-354 with its pretrained force-load
  monkeypatched out and the ``.cuda()`` calls neutralized for CPU), drives
  it and the fenet Generator with the SAME converted weights, and asserts
  all three output resolutions agree.
- golden-value tests: fixed seeded clouds evaluated by the reference's own
  pure-torch oracles (loss/loss_.py:66-140, recorded by tests/make_goldens.py
  into tests/goldens/metric_goldens.npz) vs fenet's ops — the BASELINE.json
  "CD within 1%" bar, which in practice holds to float tolerance.
"""

from __future__ import annotations

import importlib
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fenet.models.convert import merge_variables, torch_state_dict_to_variables
from fenet.models.generator import Generator

REF_MODELS_DIR = "/root/reference/models"
GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "metric_goldens.npz")


# ---------------------------------------------------------------------------
# Real reference generator (RepVGG-A2 flagship)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_cmlp_module():
    """Import the reference model module with CPU-compat patches.

    - ``.cuda()`` (edge_conv2d builds a fresh cuda conv per forward,
      …_cmlp.py:8-24; forward re-cudas its output at :257) becomes a no-op;
    - ``create_RepVGG_A2``'s pretrained force-load (…_cmlp.py:350-353) is
      replaced by the same RepVGG(...) construction without torch.load.
    The patches touch call-time behavior only; the architecture code under
    test is the reference's own.
    """
    if not os.path.isdir(REF_MODELS_DIR):
        pytest.skip("reference checkout not available")
    orig_tensor_cuda = torch.Tensor.cuda
    orig_module_cuda = nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF_MODELS_DIR)
    try:
        mod = importlib.import_module("repvgg_edge_nose_NEW_cmlp")
        mod = importlib.reload(mod)  # pick up patched torch if cached

        def create_a2_noload(deploy=False):
            return mod.RepVGG(
                num_blocks=[2, 4, 14, 1], num_classes=1000,
                width_multiplier=[1.5, 1.5, 1.5, 2.75],
                override_groups_map=None, deploy=deploy,
            )

        mod.create_RepVGG_A2 = create_a2_noload
        yield mod
    finally:
        sys.path.remove(REF_MODELS_DIR)
        torch.Tensor.cuda = orig_tensor_cuda
        nn.Module.cuda = orig_module_cuda


def _randomize_bn(model: nn.Module) -> None:
    """Give BN layers non-trivial running stats so stat conversion is
    actually exercised (fresh BN is mean=0/var=1, which hides transposition
    and naming bugs)."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(0, 0.2)


def test_real_reference_generator_parity(ref_cmlp_module):
    """fenet Generator == the reference generator (…_cmlp.py:210-336) with
    converted weights, at the flagship RepVGG-A2 config."""
    mod = ref_cmlp_module
    torch.manual_seed(0)
    tgen = mod.generator(num_points=1024)
    _randomize_bn(tgen)
    tgen.eval()

    x = torch.rand(2, 3, 128, 128) * 255
    with torch.no_grad():
        tp1, tp2, tp3 = tgen(x)  # reference returns [B, 3, N] (:332-336)

    variables = torch_state_dict_to_variables(tgen.state_dict())
    gen = Generator(num_points=1024, backbone="RepVGG-A2")
    init_vars = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    merged = {
        "params": merge_variables(init_vars["params"], variables["params"]),
        "batch_stats": merge_variables(
            init_vars["batch_stats"], variables["batch_stats"]
        ),
    }
    # Every fenet parameter must be covered by a converted reference weight
    # (the reference's dead edge1 branch, …_cmlp.py:222-226, is skipped by
    # the converter and absent from the fenet model).
    n_init = len(jax.tree_util.tree_leaves(init_vars["params"]))
    n_conv = len(jax.tree_util.tree_leaves(variables["params"]))
    assert n_init == n_conv, (n_init, n_conv)

    jp1, jp2, jp3 = gen.apply(
        merged, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False
    )
    for ours, ref in ((jp1, tp1), (jp2, tp2), (jp3, tp3)):
        np.testing.assert_allclose(
            np.asarray(ours),
            ref.numpy().transpose(0, 2, 1),
            rtol=1e-3,
            atol=2e-3,
        )


def test_real_reference_repvgg_block_fold(ref_cmlp_module):
    """The reference's own get_equivalent_kernel_bias (…_cmlp.py:101-139) vs
    fenet's fold on converted weights: both folds of the same block agree."""
    mod = ref_cmlp_module
    torch.manual_seed(1)
    block = mod.RepVGGBlock(8, 8, kernel_size=3, stride=1, padding=1)
    _randomize_bn(block)
    block.eval()
    kernel, bias = block.get_equivalent_kernel_bias()

    from fenet.models.repvgg import fold_block

    variables = torch_state_dict_to_variables(
        {f"RepVGG.stage0.{k}": v for k, v in block.state_dict().items()}
    )
    folded = fold_block(
        variables["params"]["RepVGG"]["stage0"],
        variables["batch_stats"]["RepVGG"]["stage0"],
    )["rbr_reparam"]
    np.testing.assert_allclose(
        np.asarray(folded["kernel"]),
        kernel.detach().numpy().transpose(2, 3, 1, 0),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(folded["bias"]), bias.detach().numpy(),
        rtol=1e-4, atol=1e-5,
    )


# ---------------------------------------------------------------------------
# Golden metric values (generated by tests/make_goldens.py from loss_.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def goldens():
    data = np.load(GOLDENS)
    rng = np.random.RandomState(int(data["seed"]))
    a = rng.rand(4, 1024, 3).astype(np.float32)
    b = rng.rand(4, 1024, 3).astype(np.float32)
    return data, a, b


def test_chamfer_matches_reference_golden(goldens):
    """Per-sample CD within 1% of the reference oracle (loss_.py:79-91) —
    the BASELINE.json north-star bar; actual agreement is float-level."""
    data, a, b = goldens
    from fenet.ops.chamfer import chamfer_distance

    d1, d2, i1, i2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    cd = np.asarray(d1.mean(axis=1) + d2.mean(axis=1))
    # rtol 1e-5 is far inside the BASELINE.json 1% (rtol 1e-2) bar.
    np.testing.assert_allclose(cd, data["cd_per_sample"], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d1.mean(axis=1)), data["dist1_mean"], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(d2.mean(axis=1)), data["dist2_mean"], rtol=1e-5
    )
    # argmin indices identical to the reference's (ties are measure-zero
    # for random clouds)
    np.testing.assert_array_equal(
        np.asarray(i1[:, :64]), data["idx1_head"].astype(np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(i2[:, :64]), data["idx2_head"].astype(np.int32)
    )


def test_fscore_matches_reference_golden(goldens):
    data, a, b = goldens
    from fenet.losses.fscore import fscore

    fs, p1, p2 = fscore(jnp.asarray(a), jnp.asarray(b))
    # The oracle thresholds float64 squared distances; fenet uses float32.
    # A single borderline point flipping moves these count-means by 1/4096
    # (4 samples x 1024 points), so allow two flips of slack.
    atol = 2.5 / 4096
    np.testing.assert_allclose(float(fs), data["fscore"], atol=atol)
    np.testing.assert_allclose(float(p1), data["precision_1"], atol=atol)
    np.testing.assert_allclose(float(p2), data["precision_2"], atol=atol)


def test_emd_within_recorded_optimal_margin(goldens):
    """Auction quality vs the EXACT optimal matching cost computed on the
    reference's own pairwise matrix (scipy LAP). Guards against silent
    quality regressions in the auction.

    At eval settings (eps=0.005, iters=50 — metrics.py:51) the forced
    final commit leaves the assignment non-bijective (emd_module.py:16-19),
    so the cost can land BELOW the bijective optimum — assert a band.
    At convergence (iters=3000, the train budget) the assignment is
    near-bijective and the cost must sit in [optimum, optimum * 1.005]
    (measured round 2: within 0.25% above).
    """
    data, a, b = goldens
    from fenet.ops.emd import earth_mover_distance

    opt = data["emd_optimal_sqrt_mean"]

    dist, _ = earth_mover_distance(jnp.asarray(a), jnp.asarray(b), 0.005, 50)
    at_eval = np.asarray(jnp.sqrt(dist).mean(axis=1))
    assert (np.abs(at_eval - opt) <= 0.15 * opt).all(), (at_eval, opt)

    # Convergence check on 1 of the 4 golden elements: the near-converged
    # fixed-eps auction at eps=0.005 costs ~45s/element of suite wall time
    # on this 1-core sandbox (per-element optimal values make the subset
    # valid), and one element already catches systematic quality drift.
    dist, ass = earth_mover_distance(
        jnp.asarray(a[:1]), jnp.asarray(b[:1]), 0.005, 3000
    )
    converged = np.asarray(jnp.sqrt(dist).mean(axis=1))
    opt2 = np.asarray(opt)[:1]
    assert (converged >= opt2 - 1e-4).all(), "bijective cost beat the optimum"
    assert (converged <= opt2 * 1.005).all(), (converged, opt2)
    uniq = [len(np.unique(np.asarray(ass[k]))) for k in range(ass.shape[0])]
    assert min(uniq) >= int(0.99 * a.shape[1]), uniq
