"""The reference finetune loop (finetune.py:141-182 structure), run as a
SUBPROCESS of test_train_parity — same heap-corruption isolation as
torch_ref_loop.py (torch autograd and XLA:CPU must not share a process on
this image).

Loss composition: total = 100*bce_prob(projected silhouettes) + 100*CD +
100*EMD (finetune.py:154-163), with the projection made genuinely
differentiable the same way fenet's is (the reference detaches both inputs
at utils/utils.py:199,209 — a documented fix, SURVEY.md §3.4), so the two
loops optimize the identical objective and must track step for step.

Protocol: ``python torch_ref_finetune_loop.py <in.npz> <out.json>`` —
same npz layout as torch_ref_loop.py plus ``grid_h``/``grid_w``/
``sigma_sq``. Writes per-step {bce, cd, emd, total} JSON plus the final
fc3_1 weight.
"""

import json
import sys
from collections import namedtuple

import numpy as np
import torch

from torch_ref_models import _TorchGenerator

_CAMERA_DISTANCE = 2.5  # utils/projection.py:164
_K = torch.tensor([[120.0, 0.0, -32.0], [0.0, 120.0, -32.0],
                   [0.0, 0.0, 1.0]])


def _project_silhouette(p, grid_h, grid_w, sigma_sq):
    """torch mirror of fenet.geometry.projection.project_silhouettes'
    pipeline at az=el=0 (the finetune driver's call, utils/utils.py:180):
    world2cam -> perspective -> batch-global centering -> outlier clamp ->
    scale2one -> separable gaussian splat."""
    # world2cam with az=el=0: rotation is identity, translate by -[0,0,-d].
    p = p + torch.tensor([0.0, 0.0, _CAMERA_DISTANCE])
    # perspective: divide Kx/Ky by |z_in|, keep |Kz|.
    proj = torch.einsum("ij,bnj->bni", _K, p)
    xy = proj[..., :2] / p[..., 2:3].abs()
    p = torch.cat([xy, proj[..., 2:3].abs()], dim=-1)
    # average_pcl: batch-global per-axis mean (utils/utils.py:80-87).
    mean = p.mean(dim=(0, 1))
    p = p - mean
    # outlier: clamp the per-axis argmax point to the pre-centering mean.
    idx = p.argmax(dim=1)  # (B, 3)
    p = p.clone()
    bidx = torch.arange(p.shape[0])[:, None]
    aidx = torch.arange(3)[None, :]
    p[bidx, idx, aidx] = mean[None, :]
    # scale2one: per-axis 2/extent, no re-centering (utils/utils.py:143-178).
    delta = p.max(dim=1, keepdim=True).values - p.min(dim=1, keepdim=True).values
    p = 2.0 * p / delta.abs()
    # cont_proj separable splat (projection.py:4-67 semantics).
    x = (p[..., 0] + 1.0) * grid_h / 2.0
    y = (p[..., 1] + 1.0) * grid_w / 2.0
    gh = torch.arange(grid_h, dtype=torch.float32)
    gw = torch.arange(grid_w, dtype=torch.float32)
    kx = torch.exp(-((x[..., None] - gh) ** 2) / (2.0 * sigma_sq))
    ky = torch.exp(-((y[..., None] - gw) ** 2) / (2.0 * sigma_sq))
    return torch.einsum("bnh,bnw->bhw", kx, ky)


def _bce_prob(pred, gt, w=1.0, epsilon=1e-8):
    """losses/projection.py bce_prob (the proj_loss.py:17-19 variant with
    the conventional argument order), incl. its 1e-7 floor on the second
    log argument — the singularity guard for saturated splat cells."""
    loss = -gt * torch.log(pred + epsilon) * w - (1 - gt) * torch.log(
        (1 - pred - epsilon).abs().clamp(min=1e-7)
    )
    return loss.mean()


def main(in_path, out_path):
    blob = np.load(in_path)
    cfg = namedtuple("Cfg", ["num_blocks", "width_multiplier"])(
        [int(x) for x in blob["num_blocks"]],
        [float(x) for x in blob["width_multiplier"]],
    )
    model = _TorchGenerator(
        cfg, num_points=int(blob["num_points"]),
        fine_width=int(blob["fine_width"]),
        mid_width=int(blob["mid_width"]),
    )
    model.load_state_dict(
        {k[3:]: torch.from_numpy(blob[k].copy())
         for k in blob.files if k.startswith("sd.")}
    )
    model.train()
    opt = torch.optim.Adam(
        model.parameters(), lr=float(blob["lr"]), betas=(0.9, 0.999),
        eps=1e-8, weight_decay=1e-4,
    )
    grid_h, grid_w = int(blob["grid_h"]), int(blob["grid_w"])
    sigma_sq = float(blob["sigma_sq"])

    losses = []
    for i in range(blob["imgs"].shape[0]):
        timg = torch.from_numpy(blob["imgs"][i].transpose(0, 3, 1, 2).copy())
        tpts = torch.from_numpy(blob["pts"][i].copy())
        _, _, pred = model(timg)
        d = ((pred[:, :, None, :] - tpts[:, None, :, :]) ** 2).sum(-1)
        cd = d.min(2).values.mean() + d.min(1).values.mean()
        ass = torch.from_numpy(blob["assignments"][i].copy()).long()
        matched = torch.gather(tpts, 1, ass[..., None].expand(-1, -1, 3))
        emd = ((pred - matched) ** 2).sum(-1).sqrt().mean()
        proj_pred = _project_silhouette(pred, grid_h, grid_w, sigma_sq)
        proj_gt = _project_silhouette(tpts, grid_h, grid_w, sigma_sq)
        bce = _bce_prob(proj_pred, proj_gt)
        total = 100.0 * bce + 100.0 * cd + 100.0 * emd  # finetune.py:154-163
        opt.zero_grad()
        total.backward()
        opt.step()
        losses.append(
            {"bce": float(bce), "cd": float(cd), "emd": float(emd),
             "total": float(total)}
        )

    np.save(out_path + ".fc3_1.npy", model.fc3_1.weight.detach().numpy().T)
    with open(out_path, "w") as f:
        json.dump(losses, f)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
