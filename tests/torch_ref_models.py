"""Independent torch implementation of the reference architecture.

Written from the architecture description (not copied from the reference) as
a test oracle: one random torch state_dict drives both this model and the
fenet Generator. Deliberately imports ONLY torch/numpy — the trained-parity
test runs this model's training loop in a separate process because torch
autograd and XLA:CPU corrupt the heap when interleaved in one process on
this image (glibc allocator clash; see test_train_parity.py).
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


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
    """cfg needs .width_multiplier / .num_blocks (duck-typed so the fenet
    RepVGGConfig and a plain namedtuple both work)."""

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

    def __init__(self, backbone_cfg, num_points=1024, fine_width=512,
                 mid_width=128):
        super().__init__()
        fw, mw = fine_width, mid_width  # reference hardcodes 512/128
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
        self.fc1_1 = nn.Linear(1024, 256 * fw)
        self.fc2_1 = nn.Linear(512, 128 * mw)
        self.fc3_1 = nn.Linear(256, 128 * 3)
        self.conv1_1 = nn.Conv1d(fw, fw, 1)
        self.conv1_2 = nn.Conv1d(fw, 256, 1)
        self.conv1_3 = nn.Conv1d(256, num_points * 3 // 256, 1)
        self.conv2_1 = nn.Conv1d(mw, 6, 1)
        self.num_points = num_points
        self.fine_width, self.mid_width = fw, mw

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
        pc2f = torch.relu(self.fc2_1(x2)).reshape(b, self.mid_width, 128)
        pc2o = self.conv2_1(pc2f).transpose(1, 2).reshape(b, 128, 2, 3)
        pc2 = (pc1[:, :, None] + pc2o).reshape(b, 256, 3)
        pc3f = torch.relu(self.fc1_1(x1)).reshape(b, self.fine_width, 256)
        pc3f = torch.relu(self.conv1_1(pc3f))
        pc3f = torch.relu(self.conv1_2(pc3f))
        kk = self.num_points // 256
        pc3o = self.conv1_3(pc3f).transpose(1, 2).reshape(b, 256, kk, 3)
        pc3 = (pc2[:, :, None] + pc3o).reshape(b, self.num_points, 3)
        return pc1, pc2, pc3
