"""Full-generator parity: an independent torch implementation of the
reference architecture vs the fenet Generator with converted weights.

This is the strongest layout test in the suite: one random torch state_dict
drives both models; agreement requires every conversion rule (conv/linear/
conv1d transposes, BN stats, edge-flatten channel order, decoder reshape
semantics) to be exactly right end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torch_ref_models import _TorchGenerator  # noqa: E402
from fenet.models.convert import merge_variables, torch_state_dict_to_variables
from fenet.models.generator import Generator
from fenet.models.repvgg import REPVGG_CONFIGS


def test_full_generator_forward_parity():
    torch.manual_seed(0)
    cfg = REPVGG_CONFIGS["RepVGG-TEST"]
    tgen = _TorchGenerator(cfg)
    # randomize BN running stats so conversion of stats is actually tested
    for m in tgen.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(0, 0.2)
    tgen.eval()

    x = torch.rand(2, 3, 128, 128) * 255
    with torch.no_grad():
        tp1, tp2, tp3 = tgen(x)

    variables = torch_state_dict_to_variables(tgen.state_dict())
    gen = Generator(num_points=1024, backbone="RepVGG-TEST")
    init_vars = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    # converted tree must cover every initialized parameter
    merged = {
        "params": merge_variables(init_vars["params"], variables["params"]),
        "batch_stats": merge_variables(
            init_vars["batch_stats"], variables["batch_stats"]
        ),
    }
    flat_init = jax.tree_util.tree_leaves(init_vars["params"])
    flat_conv = jax.tree_util.tree_leaves(variables["params"])
    assert len(flat_init) == len(flat_conv), "converter missed parameters"

    jp1, jp2, jp3 = gen.apply(
        merged, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(
        np.asarray(jp1), tp1.numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(jp2), tp2.numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(jp3), tp3.numpy(), rtol=1e-3, atol=2e-3
    )
