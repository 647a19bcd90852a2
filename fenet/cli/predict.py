"""Serving CLI: images in -> point clouds out, from a deploy artifact.

The reference has no serving entry point at all — inference is only
reachable through the eval scripts (testnet.py:28-79), which require a
ShapeNet-layout dataset, GT clouds, and the training checkpoint format.
This driver completes the deploy story started by
``fenet.cli.export_deploy``: it loads the folded serving checkpoint
(fp32 or bfloat16 — the sidecar records the dtype, the forward runs at
it), batches arbitrary PNG/JPG inputs through one jitted forward, and
writes one PLY per image. Pure forward, no metrics — the precision
policy (docs/DESIGN.md §2) keeps every metric path fp32, so the bf16
artifact is consumable only here and in user code.

Batching is static-shape: the last partial batch is padded to
``--batchSize`` so the whole run compiles exactly one program.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def normalize_rgb(img: np.ndarray) -> np.ndarray:
    """RGB HWC -> float32 128x128x3 — the network's input contract.

    ShapeNet renders are 137x137 and the datasets crop [4:-5, 4:-5]
    (data/shapenet.py:118); arbitrary serving inputs get the same crop
    when they arrive at 137x137, a plain resize otherwise. Raw 0..255
    pixels, no normalization — matching training exactly. Shared by this
    CLI and the HTTP server (fenet.serve)."""
    import cv2

    if img.shape[:2] == (137, 137):
        img = img[4:-5, 4:-5]
    elif img.shape[:2] != (128, 128):
        img = cv2.resize(img, (128, 128), interpolation=cv2.INTER_AREA)
    return img[:, :, :3].astype(np.float32)


def _load_image(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return normalize_rgb(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--deploy_ckpt", type=str, required=True,
                        help="folded serving checkpoint written by "
                             "fenet.cli.export_deploy (sidecar JSON "
                             "supplies the architecture and dtype)")
    parser.add_argument("--images", type=str, required=True,
                        help="image file, directory, or glob pattern")
    parser.add_argument("--out_dir", type=str, default="./predictions/")
    parser.add_argument("--batchSize", type=int, default=32)
    parser.add_argument("--ply_binary", action="store_true",
                        help="write binary little-endian PLY instead of "
                             "ascii")
    opt = parser.parse_args(argv)

    if os.path.isdir(opt.images):
        paths = sorted(
            p for ext in ("png", "jpg", "jpeg")
            for p in glob.glob(os.path.join(opt.images, f"*.{ext}"))
        )
    elif os.path.isfile(opt.images):
        paths = [opt.images]
    else:
        paths = sorted(glob.glob(opt.images))
    if not paths:
        raise FileNotFoundError(f"no images match {opt.images!r}")

    import jax

    from fenet.cli.export_deploy import load_deploy_checkpoint
    from fenet.utils.ply import export_pointcloud

    gen, variables, dtype = load_deploy_checkpoint(opt.deploy_ckpt)

    # Serving is data-parallel over every local device: params replicated,
    # image batches sharded on the batch axis — GSPMD propagates the
    # sharding through the forward, so one jitted program serves 1 or N
    # chips identically (the same layer eval uses, fenet/parallel/mesh.py).
    from fenet.parallel.mesh import make_mesh, replicate, shard_batch

    mesh = make_mesh()
    variables = jax.device_put(variables, replicate(mesh))

    @jax.jit
    def forward(variables, images):
        # Upcast on device (uint8 wire format, 4x less transfer) to the
        # artifact's serving dtype — bf16 params + fp32 images would
        # silently re-promote the whole forward to fp32.
        _, _, pc = gen.apply(variables, images.astype(dtype), train=False)
        return pc

    os.makedirs(opt.out_dir, exist_ok=True)
    n_dev = mesh.devices.size
    # Static shapes + even shards: round the batch up to the device count.
    bs = -(-opt.batchSize // n_dev) * n_dev
    written = []
    for start in range(0, len(paths), bs):
        chunk = paths[start:start + bs]
        images = np.stack([_load_image(p) for p in chunk])
        if len(chunk) < bs:  # static shapes: one compiled program total
            pad = bs - len(chunk)
            images = np.concatenate([images, images[-1:].repeat(pad, 0)])
        sharded = shard_batch({"image": images.astype(np.uint8)}, mesh)
        clouds = np.asarray(forward(variables, sharded["image"]), np.float32)
        for path, cloud in zip(chunk, clouds):
            name = os.path.splitext(os.path.basename(path))[0] + ".ply"
            out = os.path.join(opt.out_dir, name)
            export_pointcloud(cloud, out, as_text=not opt.ply_binary)
            written.append(out)
    print(f"wrote {len(written)} clouds to {opt.out_dir} "
          f"(dtype={np.dtype(dtype).name}, n_points={gen.num_points})")
    return written


if __name__ == "__main__":
    main()
