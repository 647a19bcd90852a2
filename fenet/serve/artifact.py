"""Frozen serving artifact: the deploy-folded forward as serialized
StableHLO (``jax.export``) + its weights, in one file.

The flax deploy checkpoint (fenet.cli.export_deploy) still needs the
fenet model code at load time to rebuild the Generator. This module goes
one step further down the deployment path: it exports ONE compiled-shape
program — raw uint8 pixels in, final point cloud out — together with the
folded weights, so a serving fleet can load and run the model with jax
alone (no fenet, no flax, no checkpoint plumbing) and cannot drift from
the weights it was exported with. The batch dimension is symbolic, so
one artifact serves any batch size; lowering targets both ``tpu`` and
``cpu`` by default so the identical artifact runs in production and in
CPU integration tests.

Weights are call ARGUMENTS of the exported program, not baked-in
constants: baking 174M fp32 params into the StableHLO makes a ~700 MB
module that compile services reject outright (HTTP 413 on this
platform's remote compiler) and that would otherwise be re-uploaded on
every compile. As arguments they ride the normal device_put path once at
load time and the program itself stays a few hundred KB. The container
is a single npz holding the serialized program, the weight leaves
(bfloat16 stored as uint16 bit patterns — numpy cannot serialize
ml_dtypes natively), and a JSON manifest.

The reference has nothing downstream of ``repvgg_model_convert``
(…_cmlp.py:440-448): the fold is never invoked by a driver and nothing
persists or serves it. This is the TPU-native completion of that path.
"""

from __future__ import annotations

import io
import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

ARTIFACT_SUFFIX = ".stablehlo"
_PROGRAM_KEY = "__stablehlo__"
_MANIFEST_KEY = "__manifest__"
_LEAF_FMT = "w{:05d}"


def _to_numpy(leaf) -> Tuple[np.ndarray, str]:
    """(storable array, dtype name): bf16 goes to disk as its uint16 bit
    pattern so plain numpy can round-trip it."""
    arr = np.asarray(leaf)
    name = arr.dtype.name
    if name == "bfloat16":
        return arr.view(np.uint16), "bfloat16"
    return arr, name


def _from_numpy(arr: np.ndarray, dtype_name: str) -> np.ndarray:
    if dtype_name == "bfloat16":
        import ml_dtypes

        return arr.view(ml_dtypes.bfloat16)
    return arr


def export_artifact(model, variables, out: str, *,
                    platforms: Sequence[str] = ("tpu", "cpu"),
                    input_hw: Tuple[int, int] = (128, 128),
                    extra_meta: Optional[dict] = None) -> dict:
    """Serialize ``model.apply(variables, images)`` → final cloud as a
    self-contained artifact with a symbolic batch dimension.

    ``model``/``variables`` are the DEPLOY-folded pair from
    ``models.generator.to_deploy`` (weights already at serving dtype —
    fp32 or bf16). Input contract: ``(b, H, W, 3)`` raw uint8 pixels,
    upcast on device inside the program (the same contract as
    fenet.serve.server.build_forward). Writes ``out`` plus an
    ``out + '.json'`` metadata sidecar; returns the metadata dict.
    """
    import jax
    import jax.export as jexport
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(variables)
    param_dtype = leaves[0].dtype

    def fwd(weights, images):
        v = jax.tree_util.tree_unflatten(treedef, list(weights))
        _, _, pc = model.apply(v, images.astype(param_dtype), train=False)
        return pc

    (b,) = jexport.symbolic_shape("b")
    h, w = input_hw
    weight_specs = tuple(
        jax.ShapeDtypeStruct(np.shape(l), l.dtype) for l in leaves
    )
    img_spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    exported = jexport.export(jax.jit(fwd), platforms=tuple(platforms))(
        weight_specs, img_spec
    )
    blob = exported.serialize()

    payload = {_PROGRAM_KEY: np.frombuffer(blob, np.uint8)}
    leaf_dtypes = []
    for i, leaf in enumerate(leaves):
        arr, dtype_name = _to_numpy(leaf)
        payload[_LEAF_FMT.format(i)] = arr
        leaf_dtypes.append(dtype_name)
    manifest = {"n_leaves": len(leaves), "leaf_dtypes": leaf_dtypes}
    payload[_MANIFEST_KEY] = np.frombuffer(
        json.dumps(manifest).encode(), np.uint8
    )
    buf = io.BytesIO()
    np.savez(buf, **payload)  # file-object form: numpy must not append .npz
    with open(out, "wb") as f:
        f.write(buf.getvalue())

    meta = {
        "format": "stablehlo",
        "input": f"(b, {h}, {w}, 3) uint8 BHWC raw pixels",
        "output": f"(b, {model.num_points}, 3) "
                  f"{np.dtype(param_dtype).name}",
        "num_points": int(model.num_points),
        "dtype": np.dtype(param_dtype).name,
        "platforms": list(platforms),
        "program_bytes": len(blob),
        # Size accounting: the A2 artifact is ~698 MB because the model
        # holds ~174M params (the decoder FC heads, not the backbone);
        # file ~= weight_bytes + program_bytes + zip overhead, nothing
        # stored twice (docs/OPERATIONS.md §1).
        "weight_bytes": int(sum(
            np.asarray(l).size * np.asarray(l).dtype.itemsize
            for l in leaves
        )),
        "n_params": int(sum(np.asarray(l).size for l in leaves)),
        "bytes": os.path.getsize(out),
        "n_weights": len(leaves),
    }
    if extra_meta:
        meta.update(extra_meta)
    with open(out + ".json", "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return meta


def load_artifact(path: str, mesh=None):
    """(forward, meta) from a serialized artifact.

    ``forward`` takes a ``(b, H, W, 3)`` uint8 numpy/jax array and returns
    the ``(b, num_points, 3)`` cloud — jitted, weights device_put once at
    load, so each distinct batch size compiles once (serving uses one
    fixed batch; see serve.batcher). Needs only jax + numpy — no fenet
    model code, no flax, no checkpoint.

    ``mesh``: an optional 1-D ``jax.sharding.Mesh``. The exported program
    was lowered for ONE device; with a multi-device mesh it is replayed
    per shard under ``shard_map`` — weights replicated, batch axis split —
    so one artifact data-parallel-serves a whole host without
    re-exporting. Batch size must then divide the mesh (the server rounds
    ``max_batch`` up; see :func:`build_forward_artifact`)."""
    import jax
    import jax.export as jexport

    # np.load detects the zip container regardless of the non-.npz suffix
    # and memory-maps members lazily — reading the whole file into a
    # BytesIO first would transiently hold file bytes + decoded arrays
    # (~1.4 GB peak for the fp32 A2 artifact) for no benefit.
    z = np.load(path)
    exported = jexport.deserialize(z[_PROGRAM_KEY].tobytes())
    manifest = json.loads(z[_MANIFEST_KEY].tobytes().decode())
    host_weights = [
        _from_numpy(z[_LEAF_FMT.format(i)], dt)
        for i, dt in enumerate(manifest["leaf_dtypes"])
    ]
    if mesh is not None and int(mesh.devices.size) > 1:
        from jax.sharding import PartitionSpec as P

        from fenet.parallel.mesh import (
            batch_sharding, collective_compiler_options, replicate,
        )

        try:  # moved out of experimental in recent jax
            from jax import shard_map as _shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map as _shard_map

        rep = replicate(mesh)
        weights = tuple(jax.device_put(w, rep) for w in host_weights)
        axis = mesh.axis_names[0]
        body = _shard_map(
            lambda w, images: exported.call(w, images),
            mesh=mesh,
            in_specs=(P(), P(axis)),  # weights replicated, batch split
            out_specs=P(axis),
            check_vma=False,
        )
        call = jax.jit(
            body, compiler_options=collective_compiler_options(mesh)
        )
        in_sharding = batch_sharding(mesh)
    else:
        weights = tuple(jax.device_put(w) for w in host_weights)
        call = jax.jit(exported.call)
        in_sharding = None

    def forward(images):
        if in_sharding is not None and not hasattr(images, "sharding"):
            images = jax.device_put(np.asarray(images), in_sharding)
        return call(weights, images)

    meta = {}
    sidecar = path + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
    return forward, meta


def build_forward_artifact(path: str, max_batch: int, mesh=None):
    """(forward, meta) in the fenet.serve.server.build_forward contract,
    backed by a frozen artifact instead of a flax checkpoint: single
    compiled program, inputs staged via device_put (async dispatch — the
    MicroBatcher fetches results only after the next batch is dispatched,
    keeping the depth-1 pipeline). Like the flax path, the batch is
    dp-sharded over the host's device mesh (``max_batch`` rounded up to
    the device count) — the single-device exported program is replayed
    per shard; see :func:`load_artifact`."""
    import jax

    from fenet.parallel.mesh import batch_sharding, make_mesh

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    call, meta = load_artifact(path, mesh=mesh if n_dev > 1 else None)
    max_batch = -(-max_batch // n_dev) * n_dev
    sharding = batch_sharding(mesh) if n_dev > 1 else None

    def forward(images: np.ndarray):
        staged = np.ascontiguousarray(images.astype(np.uint8))
        return call(jax.device_put(staged, sharding) if sharding is not None
                    else jax.device_put(staged))

    meta = dict(meta)
    meta["max_batch"] = int(max_batch)
    meta["devices"] = n_dev
    meta["artifact"] = os.path.basename(path)
    return forward, meta
