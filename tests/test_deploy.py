"""Full-generator deploy fold: branched eval == folded deploy forward.

Width-scaled decoders: the fold touches only conv+BN pairs (backbone/edge);
the decoder passes through unchanged, so narrow heads cover the identical
fold code path at a fraction of the single-core cost."""

import jax
import jax.numpy as jnp
import numpy as np

from fenet.models.generator import Generator, fold_generator_params

import pytest

pytestmark = pytest.mark.fast  # core tier: `pytest -m fast` (<5 min warm)


def test_generator_deploy_fold_equivalence():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 128, 128, 3) * 255, jnp.float32)
    gen = Generator(num_points=1024, backbone="RepVGG-TEST",
                    fine_width=64, mid_width=32)
    variables = gen.init(jax.random.PRNGKey(0), x[:1], train=False)

    # randomize BN stats so the fold is non-trivial
    import flax

    variables = flax.core.unfreeze(variables)

    def walk(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v)
            elif k == "mean":
                tree[k] = jnp.asarray(rng.normal(size=v.shape) * 0.3, jnp.float32)
            elif k == "var":
                tree[k] = jnp.asarray(rng.uniform(0.5, 2.0, size=v.shape), jnp.float32)

    walk(variables["batch_stats"])

    ref = gen.apply(variables, x, train=False)
    folded = fold_generator_params(
        variables["params"], variables["batch_stats"]
    )
    deploy = Generator(num_points=1024, backbone="RepVGG-TEST", deploy=True,
                       fine_width=64, mid_width=32)
    got = deploy.apply({"params": folded}, x, train=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )


def test_to_deploy_through_eval_step():
    """`to_deploy` + the batched eval step == branched eval step metrics
    (the --deploy CLI path; align=False keeps ICP's chaotic sensitivity out
    of the comparison)."""
    from fenet.eval.runner import make_eval_step
    from fenet.models.generator import to_deploy
    from fenet.parallel.mesh import make_mesh, shard_batch

    rng = np.random.RandomState(1)
    images = (rng.rand(2, 128, 128, 3) * 255).astype(np.uint8)
    points = rng.rand(2, 256, 3).astype(np.float32)
    gen = Generator(num_points=256, backbone="RepVGG-TEST",
                    fine_width=64, mid_width=32)
    variables = gen.init(
        jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32),
        train=False,
    )
    mesh = make_mesh(1)
    sharded = shard_batch({"i": images, "p": points}, mesh)

    step, _ = make_eval_step(gen, mesh=mesh, align=False, emd_iters=10)
    ref = step(variables, sharded["i"], sharded["p"])

    dep_gen, dep_vars = to_deploy(gen, variables)
    assert dep_gen.deploy and "batch_stats" not in dep_vars
    dstep, _ = make_eval_step(dep_gen, mesh=mesh, align=False, emd_iters=10)
    got = dstep(dep_vars, sharded["i"], sharded["p"])
    np.testing.assert_allclose(
        np.asarray(ref["cd"]), np.asarray(got["cd"]), rtol=1e-3, atol=1e-3
    )
