"""The reference torch training loop (train.py:137-189 structure), run as a
SUBPROCESS of test_train_parity — torch autograd and XLA:CPU corrupt the
glibc heap when interleaved in one process on this image, so the torch side
never imports jax and the jax side never runs torch autograd.

Protocol: ``python torch_ref_loop.py <in.npz> <out.json>`` where the npz
holds the initial state_dict (``sd.<name>`` keys), per-step batches
(``imgs``/``pts``, leading step axis), per-step EMD assignments recorded by
the fenet auction on the fenet predictions (identical gradient contract to
the reference CUDA op: gradient to pred through a fixed assignment,
emd_cuda.cu:284-300), and hyperparameters. Writes per-step losses as JSON
plus the final fc3_1 weight for a parameter-trajectory check.
"""

import json
import sys
from collections import namedtuple

import numpy as np
import torch

from torch_ref_models import _TorchGenerator


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
    # The reference optimizer, verbatim semantics (train.py:115).
    opt = torch.optim.Adam(
        model.parameters(), lr=float(blob["lr"]), betas=(0.9, 0.999),
        eps=1e-8, weight_decay=1e-4,
    )

    losses = []
    for i in range(blob["imgs"].shape[0]):
        timg = torch.from_numpy(blob["imgs"][i].transpose(0, 3, 1, 2).copy())
        tpts = torch.from_numpy(blob["pts"][i].copy())
        _, _, pred = model(timg)
        # Brute-force squared-NN chamfer: the loss.py:30-37 composition.
        d = ((pred[:, :, None, :] - tpts[:, None, :, :]) ** 2).sum(-1)
        cd = d.min(2).values.mean() + d.min(1).values.mean()
        ass = torch.from_numpy(blob["assignments"][i].copy()).long()
        matched = torch.gather(tpts, 1, ass[..., None].expand(-1, -1, 3))
        emd = ((pred - matched) ** 2).sum(-1).sqrt().mean()
        total = 100.0 * cd + 100.0 * emd  # epoch <= 30 schedule
        opt.zero_grad()
        total.backward()
        opt.step()
        losses.append(
            {"cd": float(cd), "emd": float(emd), "total": float(total)}
        )

    np.save(out_path + ".fc3_1.npy", model.fc3_1.weight.detach().numpy().T)
    with open(out_path, "w") as f:
        json.dump(losses, f)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
