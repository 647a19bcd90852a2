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


from fenet.utils.images import normalize_rgb


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

    from fenet.serve.server import build_forward
    from fenet.utils.ply import export_pointcloud

    # ONE construction of the dp-sharded replicated-params serving forward
    # for both this CLI and the HTTP server (fenet/serve/server.py); the
    # batch is rounded up to the device count there.
    forward, meta = build_forward(opt.deploy_ckpt, opt.batchSize)
    bs = meta["max_batch"]

    os.makedirs(opt.out_dir, exist_ok=True)
    written = []
    used_names = set()  # chair.png + chair.jpg must not collide on .ply

    def flush(chunk, out):
        """Fetch a dispatched batch (blocks until the device drains) and
        write its PLYs."""
        clouds = np.asarray(out, np.float32)
        for path, cloud in zip(chunk, clouds):
            stem = os.path.splitext(os.path.basename(path))[0]
            name, k = stem + ".ply", 1
            while name in used_names:
                name, k = f"{stem}_{k}.ply", k + 1
            used_names.add(name)
            dst = os.path.join(opt.out_dir, name)
            export_pointcloud(cloud, dst, as_text=not opt.ply_binary)
            written.append(dst)

    # Depth-1 pipeline (the eval runner's design): batch i is fetched only
    # after batch i+1 is dispatched, so decode + host->device transfer of
    # the next batch overlap the current batch's compute.
    pending = None
    for start in range(0, len(paths), bs):
        chunk = paths[start:start + bs]
        images = np.stack([_load_image(p) for p in chunk])
        if len(chunk) < bs:  # static shapes: one compiled program total
            pad = bs - len(chunk)
            images = np.concatenate([images, images[-1:].repeat(pad, 0)])
        out = forward(images.astype(np.uint8))  # async dispatch
        if pending is not None:
            flush(*pending)
        pending = (chunk, out)
    if pending is not None:
        flush(*pending)
    print(f"wrote {len(written)} clouds to {opt.out_dir} "
          f"(dtype={meta['dtype']}, n_points={meta['num_points']})")
    return written


if __name__ == "__main__":
    main()
