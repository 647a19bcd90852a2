"""Real-chip kernel smoke subset — run every round, ~3 minutes.

Covers exactly the kernels whose unit tests otherwise run interpret-mode on
CPU (which skips Mosaic lowering — the check that caught the round-3
Sinkhorn g-layout bug only at bench time): chamfer resident + streaming,
EMD auction resident + streaming + epsilon-scaling, Sinkhorn resident +
streaming, the deploy-folded forward in fp32 + bf16, and the frozen
stablehlo serving artifact (jax.export), each at a production shape
(batch >= 8).

Usage::

    python tpu_smoke.py            # asserts a real TPU backend
    python tpu_smoke.py --out TPU_SMOKE.json

Prints one JSON line per check as it completes (so a timeout still leaves a
partial record on stdout) and writes the aggregate to ``TPU_SMOKE.json``.
Exit code 0 iff every check passed. Results are force-fetched via
``np.asarray`` — on this platform ``block_until_ready`` can return before
execution finishes (same caveat as bench.py).

Reference anchors for the semantics being smoked: chamfer3D.cu:12-174,
emd_cuda.cu:228-316, loss/loss_.py:111-120 (geomloss analog),
repvgg_edge_nose_NEW_cmlp.py:101-158 (deploy fold).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def _fetch(x):
    return np.asarray(x)


def check_chamfer_resident():
    import jax
    import jax.numpy as jnp

    from fenet.ops.chamfer import chamfer_distance, chamfer_distance_ref

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(48, 1024, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(48, 1024, 3).astype(np.float32))
    d1, d2, i1, i2 = chamfer_distance(a, b)
    r1, r2, j1, j2 = chamfer_distance_ref(a, b)
    err = max(
        float(jnp.max(jnp.abs(d1 - r1))), float(jnp.max(jnp.abs(d2 - r2)))
    )
    assert err < 1e-5, f"chamfer dist mismatch vs jnp oracle: {err}"
    # Indices may differ at exact ties; distances gathered via the kernel's
    # own indices must reproduce its distances.
    bidx = jnp.arange(a.shape[0])[:, None]
    gath = jnp.sum((a - b[bidx, i1]) ** 2, axis=-1)
    gerr = float(jnp.max(jnp.abs(gath - d1)))
    assert gerr < 1e-5, f"chamfer idx1 not self-consistent: {gerr}"
    # Gradient path (deterministic scatter-add backward).
    g = jax.grad(lambda x: chamfer_distance(x, b)[0].sum())(a)
    assert bool(jnp.all(jnp.isfinite(g))), "chamfer grad not finite"
    return {"shape": "48x1024 vs 1024", "max_err": err}


def check_chamfer_streaming():
    import jax.numpy as jnp

    from fenet.ops.chamfer import chamfer_distance, chamfer_distance_ref

    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(8, 1024, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(8, 16384, 3).astype(np.float32))  # > VMEM cap
    d1, d2, i1, i2 = chamfer_distance(a, b)
    r1, r2, _, _ = chamfer_distance_ref(a, b)
    err = max(
        float(jnp.max(jnp.abs(d1 - r1))), float(jnp.max(jnp.abs(d2 - r2)))
    )
    assert err < 1e-5, f"streaming chamfer mismatch vs jnp oracle: {err}"
    return {"shape": "8x1024 vs 16384", "max_err": err}


def _emd_validity(x, y, dist, ass, eps, label):
    """The reference's own oracle (emd/test.py:23-28): gathered recompute +
    assignment near-bijectivity."""
    import jax.numpy as jnp

    b, n = ass.shape
    bidx = jnp.arange(b)[:, None]
    gath = jnp.sum((x - y[bidx, ass]) ** 2, axis=-1)
    gerr = float(jnp.max(jnp.abs(gath - dist)))
    assert gerr < 1e-5, f"{label}: dist != gathered recompute ({gerr})"
    uniq = min(
        int(len(np.unique(np.asarray(ass[i])))) for i in range(b)
    )
    assert uniq >= int(0.95 * n), (
        f"{label}: assignment far from bijective ({uniq}/{n} unique)"
    )
    return {"gather_err": gerr, "min_unique": uniq, "n": n}


def check_emd_resident():
    import jax.numpy as jnp

    from fenet.ops.emd import earth_mover_distance

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(8, 1024, 3).astype(np.float32) * 0.9)
    y = jnp.asarray(rng.rand(8, 1024, 3).astype(np.float32) * 0.9)
    dist, ass = earth_mover_distance(x, y, 0.005, 50)
    _fetch(dist)
    return _emd_validity(x, y, dist, ass, 0.005, "emd resident")


def check_emd_streaming():
    import jax.numpy as jnp

    from fenet.ops.emd import earth_mover_distance

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(8, 2048, 3).astype(np.float32) * 0.9)
    y = jnp.asarray(rng.rand(8, 2048, 3).astype(np.float32) * 0.9)
    dist, ass = earth_mover_distance(x, y, 0.005, 50)
    _fetch(dist)
    return _emd_validity(x, y, dist, ass, 0.005, "emd streaming")


def check_emd_odd_n():
    """Odd-N padding (round 5): N=1000 pads to 1024 inside the Pallas
    kernel with inert far-away points — one deterministic code path where
    the reference hard-errors (emd_module.py:36-39). Validity oracle plus
    agreement with the XLA auction at the REAL N, and no real point may
    ever be assigned a pad column."""
    import jax.numpy as jnp

    from fenet.ops.emd import earth_mover_distance, earth_mover_distance_ref

    rng = np.random.RandomState(10)
    n = 1000
    x = jnp.asarray(rng.rand(8, n, 3).astype(np.float32) * 0.9)
    y = jnp.asarray(rng.rand(8, n, 3).astype(np.float32) * 0.9)
    dist, ass = earth_mover_distance(x, y, 0.005, 50)
    _fetch(dist)
    assert ass.shape == (8, n), ass.shape
    amax = int(jnp.max(ass))
    assert amax < n, f"real point assigned a pad column: {amax} >= {n}"
    out = _emd_validity(x, y, dist, ass, 0.005, "emd odd n")
    d_ref, _ = earth_mover_distance_ref(x, y, 0.005, 50)
    m_pal, m_ref = float(jnp.mean(dist)), float(jnp.mean(d_ref))
    rel = abs(m_pal - m_ref) / max(m_ref, 1e-9)
    assert rel < 0.02, f"padded kernel vs XLA ref mean dist diverges: {rel}"
    out["mean_vs_ref_rel"] = rel
    return out


def check_emd_scaling():
    import jax.numpy as jnp

    from fenet.ops.emd import earth_mover_distance

    rng = np.random.RandomState(4)
    # Far-apart clouds: the regime where epsilon-scaling engages.
    x = jnp.asarray(rng.rand(8, 1024, 3).astype(np.float32) * 0.2)
    y = jnp.asarray(rng.rand(8, 1024, 3).astype(np.float32) * 0.2 + 0.7)
    d_fix, a_fix = earth_mover_distance(x, y, 0.05, 3000)
    d_scl, a_scl = earth_mover_distance(x, y, 0.05, 3000, 3, True, 0.3)
    m_fix = float(jnp.mean(d_fix))
    m_scl = float(jnp.mean(d_scl))
    rel = abs(m_fix - m_scl) / max(m_fix, 1e-9)
    # Same final-eps auction optimality: converged mean cost agrees.
    assert rel < 0.02, f"scaling vs fixed mean dist diverges: {rel}"
    _emd_validity(x, y, d_scl, a_scl, 0.05, "emd scaling")
    return {"mean_fixed": m_fix, "mean_scaled": m_scl, "rel_diff": rel}


def check_sinkhorn_resident():
    import jax.numpy as jnp

    from fenet.ops.sinkhorn import sinkhorn_potentials

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(8, 1024, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(8, 1024, 3).astype(np.float32))
    f, g = sinkhorn_potentials(x, y, 1e-4, 300)
    _fetch(f), _fetch(g)
    assert bool(jnp.all(jnp.isfinite(f))) and bool(
        jnp.all(jnp.isfinite(g))
    ), "sinkhorn potentials not finite"
    # Fixed-point residual in potential space (exp-space marginals overflow
    # fp32 at eps=1e-4): the kernel's Gauss-Seidel order updates g LAST, so
    # g must exactly satisfy its own update given f — recompute it in XLA.
    import jax

    eps = 1e-4
    # HIGHEST-precision cross term: the kernel computes the cost matrix at
    # Precision.HIGHEST; the TPU default bf16 einsum would put ~1e-2 noise
    # into c and swamp the residual being measured.
    c = jnp.maximum(
        jnp.sum(x**2, -1)[:, :, None]
        + jnp.sum(y**2, -1)[:, None, :]
        - 2.0 * jnp.einsum("bnc,bmc->bnm", x, y,
                           precision=jax.lax.Precision.HIGHEST),
        0.0,
    )
    n = x.shape[1]
    g2 = -eps * jax.scipy.special.logsumexp(
        (f[:, :, None] - c) / eps - jnp.log(n), axis=1
    )
    resid = float(jnp.max(jnp.abs(g2 - g)))
    assert resid < 1e-3, f"sinkhorn g fixed-point residual: {resid}"
    return {"shape": "8x1024, iters=300", "g_fixed_point_resid": resid}


def check_sinkhorn_streaming():
    import jax.numpy as jnp

    from fenet.ops.sinkhorn import (
        sinkhorn_potentials,
        sinkhorn_potentials_stream,
    )

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(8, 2048, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(8, 2048, 3).astype(np.float32))
    f, g = sinkhorn_potentials_stream(x, y, 1e-4, 100)
    _fetch(f), _fetch(g)
    assert bool(jnp.all(jnp.isfinite(f))) and bool(
        jnp.all(jnp.isfinite(g))
    ), "streaming sinkhorn potentials not finite"
    # Agreement with the resident kernel at a shape both support.
    xa = jnp.asarray(rng.rand(8, 512, 3).astype(np.float32))
    ya = jnp.asarray(rng.rand(8, 512, 3).astype(np.float32))
    fr, gr = sinkhorn_potentials(xa, ya, 1e-4, 50)
    fs, gs = sinkhorn_potentials_stream(xa, ya, 1e-4, 50)
    err = max(
        float(jnp.max(jnp.abs(fr - fs))), float(jnp.max(jnp.abs(gr - gs)))
    )
    assert err < 1e-4, f"stream vs resident sinkhorn mismatch: {err}"
    return {"shape": "8x2048, iters=100", "stream_vs_resident_err": err}


def _deploy_pair():
    import jax

    from fenet.models.generator import Generator, init_variables

    model = Generator(num_points=1024, backbone="RepVGG-A2")
    variables = init_variables(
        model, np.zeros((1, 128, 128, 3), np.float32),
        rng=jax.random.PRNGKey(0),
    )
    return model, variables


def check_deploy_fold_fp32():
    import jax
    import jax.numpy as jnp

    from fenet.models.generator import to_deploy

    model, variables = _deploy_pair()
    dep_model, dep_vars = to_deploy(model, variables)
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(8, 128, 128, 3).astype(np.float32) * 255)
    # Fold exactness must be judged at full fp32 conv precision: the TPU's
    # default conv path is bf16-reduced (README perf notes), under which
    # branched-vs-folded legitimately differ at ~1e-2 relative (measured
    # 0.007 on v5e — that is matmul noise, not a fold bug).
    with jax.default_matmul_precision("highest"):
        _, _, pc_b = jax.jit(
            lambda v, i: model.apply(v, i, train=False)
        )(variables, img)
        _, _, pc_d = jax.jit(
            lambda v, i: dep_model.apply(v, i, train=False)
        )(dep_vars, img)
    err = float(jnp.max(jnp.abs(pc_b - pc_d)))
    scale = float(jnp.max(jnp.abs(pc_b))) + 1e-9
    assert err / scale < 1e-3, f"deploy fold not exact: rel {err / scale}"
    return {"batch": 8, "max_abs_err": err, "rel_err": err / scale,
            "precision": "highest (fp32 convs)"}


def check_deploy_fold_bf16():
    import jax
    import jax.numpy as jnp

    from fenet.models.generator import to_deploy

    model, variables = _deploy_pair()
    dep_model, dep_vars = to_deploy(model, variables, dtype=jnp.bfloat16)
    rng = np.random.RandomState(8)
    img = jnp.asarray(rng.rand(8, 128, 128, 3).astype(np.float32) * 255)
    _, _, pc_f = jax.jit(
        lambda v, i: model.apply(v, i, train=False)
    )(variables, img)
    _, _, pc_b = jax.jit(
        lambda v, i: dep_model.apply(v, i.astype(jnp.bfloat16), train=False)
    )(dep_vars, img)
    rel = float(
        jnp.max(jnp.abs(pc_b.astype(jnp.float32) - pc_f))
        / (jnp.max(jnp.abs(pc_f)) + 1e-9)
    )
    assert np.isfinite(rel) and rel < 5e-2, f"bf16 deploy rel err: {rel}"
    return {"batch": 8, "rel_err": rel}


def check_stablehlo_artifact():
    """Frozen jax.export serving artifact (export_deploy --format
    stablehlo): serialize the A2 deploy fold with a symbolic batch dim,
    deserialize, execute ON THE CHIP, compare to the folded forward.
    Covers the TPU lowering of the exported program — the one step the
    CPU roundtrip test (tests/test_serve.py) cannot."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from fenet.models.generator import to_deploy
    from fenet.serve.artifact import export_artifact, load_artifact

    model, variables = _deploy_pair()
    dep_model, dep_vars = to_deploy(model, variables)
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "model.stablehlo")
        meta = export_artifact(dep_model, dep_vars, out,
                               platforms=("tpu",))
        call, _ = load_artifact(out)
        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, (8, 128, 128, 3)).astype(np.uint8)
        got = _fetch(call(img))
    _, _, ref = jax.jit(
        lambda v, i: dep_model.apply(v, i, train=False)
    )(dep_vars, jnp.asarray(img, jnp.float32))
    ref = _fetch(ref)
    rel = float(np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9))
    assert got.shape == (8, model.num_points, 3), got.shape
    assert np.all(np.isfinite(got)) and rel < 1e-2, f"artifact rel {rel}"
    return {"batch": 8, "rel_err": rel, "bytes": meta["bytes"]}


CHECKS = [
    ("chamfer_resident", check_chamfer_resident),
    ("chamfer_streaming", check_chamfer_streaming),
    ("emd_resident", check_emd_resident),
    ("emd_streaming", check_emd_streaming),
    ("emd_odd_n", check_emd_odd_n),
    ("emd_scaling", check_emd_scaling),
    ("sinkhorn_resident", check_sinkhorn_resident),
    ("sinkhorn_streaming", check_sinkhorn_streaming),
    ("deploy_fold_fp32", check_deploy_fold_fp32),
    ("deploy_fold_bf16", check_deploy_fold_bf16),
    ("stablehlo_artifact", check_stablehlo_artifact),
]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="TPU_SMOKE.json")
    parser.add_argument(
        "--allow_cpu", action="store_true",
        help="run on a non-TPU backend anyway (CI debugging only; the "
             "point of this script is Mosaic lowering on real hardware)",
    )
    parser.add_argument(
        "--only", default=None,
        help="comma-separated subset of check names",
    )
    opt = parser.parse_args(argv)

    from fenet.utils.compilation_cache import enable

    enable()  # repeat rounds hit the persistent cache
    import jax

    backend = jax.default_backend()
    if backend != "tpu" and not opt.allow_cpu:
        print(json.dumps({"error": f"not a TPU backend: {backend}"}))
        return 2

    names = opt.only.split(",") if opt.only else None
    if names:
        known = {name for name, _ in CHECKS}
        unknown = [n for n in names if n not in known]
        if unknown:
            # A typo must not produce an empty-but-green TPU_SMOKE.json.
            print(json.dumps({"error": f"unknown checks: {unknown}",
                              "known": sorted(known)}))
            return 2
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001 - traceability only, never fatal
        commit = None
    record = {
        "platform": backend,
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "commit": commit,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "checks": {},
    }
    t_all = time.time()
    ok_all = True
    for name, fn in CHECKS:
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            detail = fn()
            entry = {"ok": True, "seconds": round(time.time() - t0, 2),
                     "detail": detail}
        except Exception as e:  # noqa: BLE001 - each check fault-isolated
            ok_all = False
            entry = {"ok": False, "seconds": round(time.time() - t0, 2),
                     "error": f"{type(e).__name__}: {str(e)[-300:]}"}
        record["checks"][name] = entry
        print(json.dumps({name: entry}), flush=True)
    record["total_seconds"] = round(time.time() - t_all, 2)
    record["ok"] = ok_all
    with open(opt.out, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"ok": ok_all,
                      "total_seconds": record["total_seconds"],
                      "out": opt.out}))
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
