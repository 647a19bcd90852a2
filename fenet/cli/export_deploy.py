"""Export a trained checkpoint in deploy-folded serving form.

The reference ships ``repvgg_model_convert`` (…_cmlp.py:440-448) — fold
every RepVGGBlock's 3x3+1x1+identity branches and BN into one biased 3x3
conv — but no driver ever invokes it and nothing persists the result. Here
the fold is a pure weight transform (``models.generator.to_deploy``), and
this CLI writes it to disk so serving systems load the folded weights
directly (half the leaves, no batch_stats, no fold at startup):

    python -m fenet.cli.export_deploy \\
        --model ./output/fenet/%s/checkpoints/ --category 02828884

The output (default ``<ckpt_dir>/model_deploy.ckpt``) holds ``{"params"}``
for ``Generator(..., deploy=True)`` plus a JSON sidecar recording the
architecture so the consumer can rebuild the module without guessing.
Numerical equivalence of the folded forward is proven in
tests/test_deploy.py; the exported-file roundtrip in tests/test_extras.py.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from fenet.models.generator import Generator, init_variables, to_deploy
from fenet.train.checkpoint import load_checkpoint


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str,
                        default="./output/fenet/%s/checkpoints/",
                        help="checkpoint dir pattern (%%s = category) or a "
                             "direct path to a .ckpt/.orbax")
    parser.add_argument("--category", type=str, default="02828884")
    parser.add_argument("--out", type=str, default=None,
                        help="output path; default "
                             "<ckpt_dir>/model_deploy.ckpt")
    parser.add_argument("--num_points", type=int, default=1024)
    parser.add_argument("--backbone", type=str, default="RepVGG-A2")
    parser.add_argument("--fine_width", type=int, default=512)
    parser.add_argument("--mid_width", type=int, default=128)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="serving precision of the folded weights; "
                             "bfloat16 runs the forward at the MXU's "
                             "native bf16 rate (2x fp32) at ~1e-2 relative "
                             "coordinate error — see models.generator."
                             "to_deploy")
    parser.add_argument("--format", type=str, default="flax",
                        choices=("flax", "stablehlo"),
                        help="flax: folded weights, loadable by "
                             "load_deploy_checkpoint (needs fenet at serve "
                             "time). stablehlo: self-contained serialized "
                             "program via jax.export — uint8 pixels in, "
                             "cloud out, program + weights in one file, "
                             "symbolic batch; "
                             "serving needs only jax (serve.artifact)")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="comma-separated lowering targets for "
                             "--format stablehlo")
    opt = parser.parse_args(argv)

    path = opt.model % opt.category if "%s" in opt.model else opt.model
    if os.path.isdir(path) and not path.endswith(".orbax"):
        path = os.path.join(path, "model_best.ckpt")

    gen = Generator(num_points=opt.num_points, backbone=opt.backbone,
                    fine_width=opt.fine_width, mid_width=opt.mid_width)
    variables = init_variables(
        gen, np.zeros((1, 128, 128, 3), np.float32))
    blob = load_checkpoint(
        path,
        target={"params": variables["params"],
                "batch_stats": variables["batch_stats"]},
    )
    import jax.numpy as jnp

    deploy_gen, deploy_vars = to_deploy(
        gen, {"params": blob["params"], "batch_stats": blob["batch_stats"]},
        dtype=jnp.dtype(opt.dtype) if opt.dtype != "float32" else None,
    )

    if opt.format == "stablehlo":
        from fenet.serve.artifact import ARTIFACT_SUFFIX, export_artifact

        out = opt.out or os.path.join(
            os.path.dirname(path), "model_deploy" + ARTIFACT_SUFFIX)
        meta = export_artifact(
            deploy_gen, deploy_vars, out,
            platforms=tuple(p.strip() for p in opt.platforms.split(",")
                            if p.strip()),
            extra_meta={"backbone": opt.backbone,
                        "fine_width": opt.fine_width,
                        "mid_width": opt.mid_width, "source": path},
        )
        print(json.dumps({"out": out, **meta}))
        return out

    out = opt.out or os.path.join(os.path.dirname(path), "model_deploy.ckpt")
    import flax.serialization

    with open(out, "wb") as f:
        f.write(flax.serialization.to_bytes(deploy_vars))
    meta = {
        "deploy": True,
        "num_points": opt.num_points,
        "backbone": opt.backbone,
        "fine_width": opt.fine_width,
        "mid_width": opt.mid_width,
        "dtype": opt.dtype,
        "source": path,
    }
    with open(out + ".json", "w") as f:
        json.dump(meta, f)
    print(json.dumps({"out": out, **meta}))
    return out


def load_deploy_checkpoint(path: str):
    """(deploy_model, variables, dtype) from an exported deploy checkpoint —
    the serving-side loader: rebuilds the Generator from the JSON sidecar
    and restores the folded params with no fold at startup. ``dtype`` is
    the serving precision the weights were exported at (numpy dtype);
    feed inputs cast to it (see models.generator.to_deploy)."""
    import flax.serialization
    import jax.numpy as jnp

    with open(path + ".json") as f:
        meta = json.load(f)
    dtype = jnp.dtype(meta.get("dtype", "float32"))
    gen = Generator(
        num_points=meta["num_points"], backbone=meta["backbone"],
        fine_width=meta["fine_width"], mid_width=meta["mid_width"],
        deploy=True,
    )
    template = init_variables(
        gen, np.zeros((1, 128, 128, 3), np.float32))
    with open(path, "rb") as f:
        variables = flax.serialization.from_bytes(
            {"params": template["params"]}, f.read()
        )
    # from_bytes restores leaves at their SERIALIZED dtype regardless of
    # the template; enforce the sidecar's declared precision here so a
    # mismatched/tampered artifact cannot serve at a dtype other than the
    # one this function reports.
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype), variables
    )
    return gen, variables, dtype


if __name__ == "__main__":
    main()
