"""Model layer: shapes, reparameterization equivalence, torch parity.

The fold-equivalence test is the flagship capability check (the reference's
switch_to_deploy is never exercised by its own drivers; here it is proven
exact — SURVEY.md §3.5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenet.models.convert import torch_state_dict_to_variables
from fenet.models.generator import Generator, SimpleGenerator, edge_conv2d
from fenet.models.repvgg import (
    REPVGG_CONFIGS,
    RepVGG,
    RepVGGBlock,
    fold_repvgg_params,
)


def _randomize_bn_stats(variables, rng):
    """Give BN non-trivial running stats/params so folding is a real test."""

    def walk(tree, is_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, is_stats)
            else:
                if k in ("mean",):
                    tree[k] = jnp.asarray(rng.normal(size=v.shape), jnp.float32)
                elif k in ("var",):
                    tree[k] = jnp.asarray(
                        rng.uniform(0.5, 2.0, size=v.shape), jnp.float32
                    )
                elif k in ("scale",):
                    tree[k] = jnp.asarray(
                        rng.uniform(0.5, 1.5, size=v.shape), jnp.float32
                    )
                elif k == "bias":
                    tree[k] = jnp.asarray(
                        0.1 * rng.normal(size=v.shape), jnp.float32
                    )

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # copy
    import flax

    variables = flax.core.unfreeze(variables)
    walk(variables["params"], False)
    walk(variables["batch_stats"], True)
    return variables


@pytest.mark.parametrize("stride,channels", [(1, 32), (2, 48)])
def test_fold_equivalence(stride, channels):
    """Branched eval-mode block == folded deploy block, to fp32 precision."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 32), jnp.float32)

    block = RepVGGBlock(channels, stride=stride)
    variables = block.init(jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_bn_stats(variables, rng)

    branched = block.apply(variables, x, train=False)

    folded_params = fold_repvgg_params(
        variables["params"], variables["batch_stats"]
    )
    deploy_block = RepVGGBlock(channels, stride=stride, deploy=True)
    folded = deploy_block.apply({"params": folded_params}, x, train=False)

    np.testing.assert_allclose(
        np.asarray(branched), np.asarray(folded), rtol=1e-4, atol=1e-4
    )


def test_generator_output_shapes():
    """Mirrors the reference's __main__ smoke check (…_cmlp.py:450-456)."""
    gen = Generator(num_points=1024, backbone="RepVGG-A0")
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    pc1, pc2, pc3 = gen.apply(variables, x, train=False)
    assert pc1.shape == (2, 128, 3)
    assert pc2.shape == (2, 256, 3)
    assert pc3.shape == (2, 1024, 3)


def test_generator_2048_points():
    gen = Generator(num_points=2048, backbone="RepVGG-A0")
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    _, _, pc3 = gen.apply(variables, x, train=False)
    assert pc3.shape == (1, 2048, 3)


def test_simple_generator_shapes():
    gen = SimpleGenerator(num_points=1024, backbone="RepVGG-A0")
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    out = gen.apply(variables, x, train=False)
    assert out.shape == (2, 1024, 3)
    assert float(jnp.abs(out).max()) <= 1.0  # tanh range


def test_cascade_offsets_are_hierarchical():
    """pc2 must be pc1 + offsets: every pc2 pair straddles its parent."""
    gen = Generator(num_points=1024, backbone="RepVGG-A0")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 128, 128, 3), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(1), x, train=False)
    pc1, pc2, pc3 = gen.apply(variables, x, train=False)
    assert not np.allclose(np.asarray(pc1), 0)


def test_edge_conv_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, 16, 16).astype(np.float32)
    k = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], np.float32) / 3
    w = np.broadcast_to(k, (3, 3, 3, 3)).copy()
    ref = torch.nn.functional.conv2d(
        torch.tensor(img), torch.tensor(w), padding=1
    ).numpy()
    ours = edge_conv2d(jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_repvgg_block_matches_torch():
    """Independent torch re-implementation of one branched block; validates
    both the block math and the state_dict layout conversion rules."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    cin, cout = 8, 8

    conv3 = torch.nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
    bn3 = torch.nn.BatchNorm2d(cout)
    conv1 = torch.nn.Conv2d(cin, cout, 1, 1, 0, bias=False)
    bn1 = torch.nn.BatchNorm2d(cout)
    bnid = torch.nn.BatchNorm2d(cin)
    for bn in (bn3, bn1, bnid):
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.data.uniform_(0.5, 1.5)
        bn.bias.data.normal_()
        bn.eval()  # use running stats, like the flax eval-mode apply
    x = torch.rand(2, cin, 12, 12)
    with torch.no_grad():
        ref = torch.relu(bn3(conv3(x)) + bn1(conv1(x)) + bnid(x)).numpy()

    state_dict = {
        "RepVGG.stage1.0.rbr_dense.conv.weight": conv3.weight,
        "RepVGG.stage1.0.rbr_dense.bn.weight": bn3.weight,
        "RepVGG.stage1.0.rbr_dense.bn.bias": bn3.bias,
        "RepVGG.stage1.0.rbr_dense.bn.running_mean": bn3.running_mean,
        "RepVGG.stage1.0.rbr_dense.bn.running_var": bn3.running_var,
        "RepVGG.stage1.0.rbr_1x1.conv.weight": conv1.weight,
        "RepVGG.stage1.0.rbr_1x1.bn.weight": bn1.weight,
        "RepVGG.stage1.0.rbr_1x1.bn.bias": bn1.bias,
        "RepVGG.stage1.0.rbr_1x1.bn.running_mean": bn1.running_mean,
        "RepVGG.stage1.0.rbr_1x1.bn.running_var": bn1.running_var,
        "RepVGG.stage1.0.rbr_identity.weight": bnid.weight,
        "RepVGG.stage1.0.rbr_identity.bias": bnid.bias,
        "RepVGG.stage1.0.rbr_identity.running_mean": bnid.running_mean,
        "RepVGG.stage1.0.rbr_identity.running_var": bnid.running_var,
    }
    variables = torch_state_dict_to_variables(state_dict)
    blk_vars = {
        "params": variables["params"]["RepVGG"]["stage1_0"],
        "batch_stats": variables["batch_stats"]["RepVGG"]["stage1_0"],
    }
    block = RepVGGBlock(cout, stride=1)
    ours = block.apply(
        blk_vars, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )

    # And the folded form agrees too.
    folded = fold_repvgg_params(blk_vars["params"], blk_vars["batch_stats"])
    deploy = RepVGGBlock(cout, stride=1, deploy=True).apply(
        {"params": folded},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(deploy).transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4
    )


@pytest.mark.fast
def test_full_backbone_fold_equivalence():
    """Fold the whole RepVGG-A0 backbone and compare logits."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    model = RepVGG(config=REPVGG_CONFIGS["RepVGG-A0"])
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_bn_stats(variables, rng)
    ref = model.apply(variables, x, train=False)

    folded = fold_repvgg_params(variables["params"], variables["batch_stats"])
    deploy = RepVGG(config=REPVGG_CONFIGS["RepVGG-A0"], deploy=True)
    got = deploy.apply({"params": folded}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_init_variables_matches_eager_init():
    """init_variables wraps Module.init in one jitted program for tunneled
    hosts (round 4: eager init measured ~100 s at ~100 ms/dispatch); the
    variables must be bit-identical to eager init — same RNG stream, same
    tree."""
    from fenet.models.generator import init_variables

    gen = Generator(num_points=1024, backbone="RepVGG-A0")
    sample = np.zeros((1, 128, 128, 3), np.float32)
    eager = gen.init(jax.random.PRNGKey(7), sample, train=False)
    jitted = init_variables(gen, sample, rng=jax.random.PRNGKey(7))
    flat_e = jax.tree_util.tree_leaves_with_path(eager)
    flat_j = jax.tree_util.tree_leaves_with_path(jitted)
    assert [p for p, _ in flat_e] == [p for p, _ in flat_j]
    for (_, a), (_, b) in zip(flat_e, flat_j):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
