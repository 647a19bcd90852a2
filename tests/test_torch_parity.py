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
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fenet.models.convert import merge_variables, torch_state_dict_to_variables
from fenet.models.generator import Generator
from fenet.models.repvgg import REPVGG_CONFIGS


def _conv_bn(cin, cout, k, s, p):
    seq = nn.Sequential()
    seq.add_module("conv", nn.Conv2d(cin, cout, k, s, p, bias=False))
    seq.add_module("bn", nn.BatchNorm2d(cout))
    return seq


class _TorchBlock(nn.Module):
    """Branched RepVGG block (eval-mode), written from the architecture
    description — 3x3+BN || 1x1+BN || identity-BN, summed, ReLU."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.rbr_dense = _conv_bn(cin, cout, 3, stride, 1)
        self.rbr_1x1 = _conv_bn(cin, cout, 1, stride, 0)
        self.rbr_identity = (
            nn.BatchNorm2d(cin) if cin == cout and stride == 1 else None
        )

    def forward(self, x):
        out = self.rbr_dense(x) + self.rbr_1x1(x)
        if self.rbr_identity is not None:
            out = out + self.rbr_identity(x)
        return torch.relu(out)


class _TorchRepVGG(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        wm = cfg.width_multiplier
        in_planes = min(64, int(64 * wm[0]))
        widths = [int(64 * wm[0]), int(128 * wm[1]), int(256 * wm[2]),
                  int(512 * wm[3])]
        self.stage0 = _TorchBlock(3, in_planes, 2)
        prev = in_planes
        stages = []
        for planes, blocks in zip(widths, cfg.num_blocks):
            seq = []
            for i, stride in enumerate([2] + [1] * (blocks - 1)):
                seq.append(_TorchBlock(prev, planes, stride))
                prev = planes
            stages.append(nn.Sequential(*seq))
        self.stage1, self.stage2, self.stage3, self.stage4 = stages
        self.linear = nn.Linear(prev, 1000)

    def forward(self, x):
        for stage in (self.stage0, self.stage1, self.stage2, self.stage3,
                      self.stage4):
            x = stage(x)
        x = x.mean(dim=(2, 3))
        return self.linear(x)


class _TorchGenerator(nn.Module):
    """The cmlp generator architecture (backbone + edge branch + cascade)."""

    def __init__(self, backbone_cfg, num_points=1024):
        super().__init__()
        self.RepVGG = _TorchRepVGG(backbone_cfg)
        self.edge0 = nn.Sequential(
            nn.Conv2d(3, 16, 3, 2, 1, bias=False), nn.BatchNorm2d(16),
            nn.ReLU(),
        )
        self.edge2 = nn.Sequential(
            nn.Conv2d(16, 3, 3, 2, 1, bias=False), nn.BatchNorm2d(3),
            nn.ReLU(),
        )
        self.linear = nn.Linear(3072, 1000)
        self.fc1 = nn.Linear(2000, 1024)
        self.fc2 = nn.Linear(1024, 512)
        self.fc3 = nn.Linear(512, 256)
        self.fc1_1 = nn.Linear(1024, 256 * 512)
        self.fc2_1 = nn.Linear(512, 128 * 128)
        self.fc3_1 = nn.Linear(256, 128 * 3)
        self.conv1_1 = nn.Conv1d(512, 512, 1)
        self.conv1_2 = nn.Conv1d(512, 256, 1)
        self.conv1_3 = nn.Conv1d(256, num_points * 3 // 256, 1)
        self.conv2_1 = nn.Conv1d(128, 6, 1)
        self.num_points = num_points

    def forward(self, x):
        b = x.shape[0]
        k = torch.tensor(
            np.broadcast_to(
                np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]],
                         np.float32) / 3.0,
                (3, 3, 3, 3),
            ).copy()
        )
        edge = F.conv2d(x, k, padding=1)
        edge = self.edge2(self.edge0(edge))
        edge = self.linear(edge.flatten(1))
        feat = self.RepVGG(x)
        h = torch.cat([feat, edge], dim=1)
        x1 = torch.relu(self.fc1(h))
        x2 = torch.relu(self.fc2(x1))
        x3 = torch.relu(self.fc3(x2))
        pc1 = self.fc3_1(x3).reshape(b, 128, 3)
        pc2f = torch.relu(self.fc2_1(x2)).reshape(b, 128, 128)
        pc2o = self.conv2_1(pc2f).transpose(1, 2).reshape(b, 128, 2, 3)
        pc2 = (pc1[:, :, None] + pc2o).reshape(b, 256, 3)
        pc3f = torch.relu(self.fc1_1(x1)).reshape(b, 512, 256)
        pc3f = torch.relu(self.conv1_1(pc3f))
        pc3f = torch.relu(self.conv1_2(pc3f))
        kk = self.num_points // 256
        pc3o = self.conv1_3(pc3f).transpose(1, 2).reshape(b, 256, kk, 3)
        pc3 = (pc2[:, :, None] + pc3o).reshape(b, self.num_points, 3)
        return pc1, pc2, pc3


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
