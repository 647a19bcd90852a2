"""Serving runtime: micro-batcher semantics + the HTTP front end e2e.

No reference counterpart (the reference has no serving entry point —
testnet.py:28-79 is its only inference surface); these tests pin the
fenet.serve contract: fixed-batch padded dispatch, row-correct fan-out,
error propagation, and the wire protocol of fenet.cli.serve.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest


def _identityish_forward(calls):
    """Fake forward: records batch shapes, returns per-row clouds encoding
    the row's mean pixel so fan-out can be checked row by row."""

    def forward(images):
        calls.append(images.shape)
        b = images.shape[0]
        means = images.reshape(b, -1).mean(axis=1).astype(np.float32)
        return np.tile(means[:, None, None], (1, 4, 3))

    return forward


def test_microbatcher_batches_pads_and_fans_out():
    from fenet.serve.batcher import MicroBatcher

    calls = []
    mb = MicroBatcher(_identityish_forward(calls), max_batch=4,
                      window_ms=50.0)
    imgs = [np.full((2, 2, 3), v, np.uint8) for v in (10, 20, 30)]
    futs = [mb.submit(im) for im in imgs]
    outs = [f.result(timeout=10) for f in futs]
    mb.close()
    # Row-correct fan-out: each result encodes its own image's mean.
    for im, out in zip(imgs, outs):
        assert out.shape == (4, 3)
        np.testing.assert_allclose(out, float(im.mean()))
    # Static shapes: every dispatched batch was padded to max_batch.
    assert all(shape[0] == 4 for shape in calls)
    # The 50 ms window gathered the burst into one dispatch.
    assert len(calls) == 1


def test_microbatcher_full_batch_dispatches_early_and_splits():
    from fenet.serve.batcher import MicroBatcher

    calls = []
    mb = MicroBatcher(_identityish_forward(calls), max_batch=2,
                      window_ms=5000.0)  # window long enough to hang if
    # the full-batch early dispatch were broken
    futs = [mb.submit(np.full((2, 2, 3), v, np.uint8))
            for v in (1, 2, 3, 4)]
    outs = [f.result(timeout=10) for f in futs]
    mb.close()
    assert [float(o[0, 0]) for o in outs] == [1.0, 2.0, 3.0, 4.0]
    assert len(calls) == 2  # 4 requests / max_batch 2, no window wait


def test_microbatcher_propagates_forward_errors_and_keeps_serving():
    from fenet.serve.batcher import MicroBatcher

    state = {"fail": True}

    def forward(images):
        if state["fail"]:
            raise RuntimeError("injected")
        return np.zeros((images.shape[0], 4, 3), np.float32)

    mb = MicroBatcher(forward, max_batch=2, window_ms=1.0)
    with pytest.raises(RuntimeError, match="injected"):
        mb.submit(np.zeros((2, 2, 3), np.uint8)).result(timeout=10)
    state["fail"] = False  # the dispatcher must have survived
    out = mb.submit(np.zeros((2, 2, 3), np.uint8)).result(timeout=10)
    mb.close()
    assert out.shape == (4, 3)


def test_microbatcher_depth1_pipeline_overlaps_inflight_batches():
    """The dispatcher must issue batch i+1 BEFORE fetching batch i's
    result (depth-1 pipeline): with a forward that returns a lazy
    array-like whose materialization sleeps, the next dispatch timestamp
    lands before the previous fetch completes — and every row still fans
    out correctly."""
    import time

    from fenet.serve.batcher import MicroBatcher

    dispatches, fetch_ends = [], []

    class Lazy:
        def __init__(self, val):
            self.val = val

        def __array__(self, dtype=None, copy=None):
            time.sleep(0.05)  # device "compute": fetch blocks until done
            fetch_ends.append(time.time())
            v = self.val
            return v.astype(dtype) if dtype is not None else v

    def forward(images):
        dispatches.append(time.time())
        b = images.shape[0]
        means = images.reshape(b, -1).mean(axis=1).astype(np.float32)
        return Lazy(np.tile(means[:, None, None], (1, 4, 3)))

    mb = MicroBatcher(forward, max_batch=1, window_ms=1.0)
    futs = [mb.submit(np.full((2, 2, 3), v, np.uint8))
            for v in (5, 6, 7, 8)]
    outs = [f.result(timeout=30) for f in futs]
    mb.close()
    for v, out in zip((5, 6, 7, 8), outs):
        np.testing.assert_allclose(out, float(v))
    assert len(dispatches) == 4 and len(fetch_ends) == 4
    # Overlap: batch 1's dispatch precedes batch 0's fetch completion.
    assert dispatches[1] < fetch_ends[0]


def test_microbatcher_shape_mismatch_fails_batch_not_dispatcher():
    """Mixed image sizes in one batch must fail THAT batch's futures and
    leave the dispatcher alive for well-formed traffic."""
    from fenet.serve.batcher import MicroBatcher

    calls = []
    mb = MicroBatcher(_identityish_forward(calls), max_batch=2,
                      window_ms=50.0)
    f1 = mb.submit(np.zeros((2, 2, 3), np.uint8))
    f2 = mb.submit(np.zeros((4, 4, 3), np.uint8))  # np.stack must raise
    with pytest.raises(ValueError):
        f1.result(timeout=10)
    with pytest.raises(ValueError):
        f2.result(timeout=10)
    out = mb.predict(np.full((2, 2, 3), 9, np.uint8))  # still serving
    mb.close()
    np.testing.assert_allclose(out, 9.0)


def test_microbatcher_forward_error_still_resolves_pending():
    """A failing dispatch must not strand the previous (already computed)
    in-flight batch's waiters."""
    import time

    from fenet.serve.batcher import MicroBatcher

    class Lazy:
        def __init__(self, val):
            self.val = val

        def __array__(self, dtype=None, copy=None):
            time.sleep(0.02)
            v = self.val
            return v.astype(dtype) if dtype is not None else v

    def forward(images):
        if images.shape[1] == 4:  # the poisoned request
            raise RuntimeError("boom")
        b = images.shape[0]
        means = images.reshape(b, -1).mean(axis=1).astype(np.float32)
        return Lazy(np.tile(means[:, None, None], (1, 4, 3)))

    mb = MicroBatcher(forward, max_batch=1, window_ms=1.0)
    good = mb.submit(np.full((2, 2, 3), 7, np.uint8))
    bad = mb.submit(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(RuntimeError, match="boom"):
        bad.result(timeout=10)
    # The good batch (dispatched first, pending when bad failed) resolves.
    np.testing.assert_allclose(good.result(timeout=10), 7.0)
    mb.close()


def test_microbatcher_concurrent_submitters():
    from fenet.serve.batcher import MicroBatcher

    calls = []
    mb = MicroBatcher(_identityish_forward(calls), max_batch=8,
                      window_ms=20.0)
    results = {}

    def worker(v):
        results[v] = mb.predict(np.full((2, 2, 3), v, np.uint8))

    threads = [threading.Thread(target=worker, args=(v,))
               for v in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    mb.close()
    assert len(results) == 16
    for v, out in results.items():
        np.testing.assert_allclose(out, float(v))


@pytest.fixture(scope="module")
def deploy_artifact(tmp_path_factory):
    """A real (tiny) bf16 deploy artifact exported through the CLI."""
    import jax

    from fenet.cli.export_deploy import main as export_main
    from fenet.models.generator import Generator
    from fenet.train.checkpoint import save_checkpoint

    tmp = tmp_path_factory.mktemp("serve")
    gen = Generator(num_points=256, backbone="RepVGG-TEST",
                    fine_width=32, mid_width=16)
    rng = np.random.RandomState(11)
    variables = gen.init(
        jax.random.PRNGKey(0),
        rng.rand(1, 128, 128, 3).astype(np.float32), train=False,
    )
    save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"], "epoch": 1},
        True, "t", str(tmp), 1,
    )
    return export_main([
        "--model", str(tmp), "--backbone", "RepVGG-TEST",
        "--num_points", "256", "--fine_width", "32", "--mid_width", "16",
        "--dtype", "bfloat16", "--out", str(tmp / "deploy.ckpt"),
    ])


@pytest.fixture(scope="module")
def http_server(deploy_artifact):
    """A live fenet.cli.serve stack: build_forward (dp-sharded over the
    fake 8-device mesh) -> ThreadingHTTPServer on an ephemeral port."""
    from fenet.serve.server import make_server

    server = make_server(deploy_artifact, port=0, max_batch=8,
                         window_ms=5.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.batcher.close()


def _png_bytes(side=137, seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    ok, buf = cv2.imencode(
        ".png", rng.randint(0, 256, (side, side, 3), np.uint8)
    )
    assert ok
    return buf.tobytes()


def test_http_healthz_and_stats(http_server):
    _, base = http_server
    health = json.load(urllib.request.urlopen(base + "/healthz", timeout=30))
    assert health["status"] == "ok"
    assert health["num_points"] == 256
    assert health["dtype"] == "bfloat16"
    stats = json.load(urllib.request.urlopen(base + "/stats", timeout=30))
    assert set(stats) == {"served", "errors"}


def test_http_predict_json_and_ply(http_server):
    from fenet.utils.ply import load_pointcloud

    _, base = http_server
    body = _png_bytes(seed=1)
    resp = json.load(urllib.request.urlopen(
        urllib.request.Request(base + "/predict", data=body), timeout=120
    ))
    pts = np.asarray(resp["points"], np.float32)
    assert pts.shape == (256, 3) and np.all(np.isfinite(pts))

    raw = urllib.request.urlopen(
        urllib.request.Request(base + "/predict?format=ply", data=body),
        timeout=120,
    ).read()
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".ply") as f:
        f.write(raw)
        f.flush()
        cloud = load_pointcloud(f.name)
    # Same image -> same cloud on both wire formats (PLY is binary f32).
    np.testing.assert_allclose(cloud, pts, rtol=1e-6, atol=1e-6)


def test_build_forward_rounds_and_serves_odd_batch(deploy_artifact):
    """max_batch below (or not a multiple of) the device count must be
    rounded up, or every dispatched batch would fail to shard over the
    mesh."""
    import jax

    from fenet.serve.batcher import MicroBatcher
    from fenet.serve.server import build_forward

    forward, meta = build_forward(deploy_artifact, max_batch=3)
    n_dev = len(jax.devices())
    assert meta["max_batch"] % n_dev == 0 and meta["max_batch"] >= 3
    mb = MicroBatcher(forward, max_batch=meta["max_batch"], window_ms=1.0)
    out = mb.predict(np.zeros((128, 128, 3), np.uint8))
    mb.close()
    assert out.shape == (256, 3) and np.all(np.isfinite(out))


def test_http_routes_are_exact(http_server):
    """Substring lookalikes must 404; a format value of 'ply' in another
    query parameter must not select PLY output."""
    _, base = http_server
    try:
        urllib.request.urlopen(
            urllib.request.Request(base + "/predictfoo",
                                   data=_png_bytes(seed=9)),
            timeout=30,
        )
        code = 200
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 404
    resp = urllib.request.urlopen(
        urllib.request.Request(base + "/predict?note=format%3Dply",
                               data=_png_bytes(seed=9)),
        timeout=120,
    )
    assert resp.headers["Content-Type"] == "application/json"


def test_http_predict_rejects_garbage(http_server):
    server, base = http_server
    try:
        urllib.request.urlopen(
            urllib.request.Request(base + "/predict", data=b"not an image"),
            timeout=30,
        )
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised


def test_http_concurrent_requests_micro_batch(http_server):
    """Concurrent HTTP clients ride one padded device batch (served count
    grows by exactly the request count; all rows finite and distinct
    per image)."""
    server, base = http_server
    before = server.stats.snapshot()["served"]
    results = {}

    def worker(seed):
        body = _png_bytes(seed=seed)
        resp = json.load(urllib.request.urlopen(
            urllib.request.Request(base + "/predict", data=body),
            timeout=120,
        ))
        results[seed] = np.asarray(resp["points"], np.float32)

    threads = [threading.Thread(target=worker, args=(s,))
               for s in range(2, 8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 6
    for out in results.values():
        assert out.shape == (256, 3) and np.all(np.isfinite(out))
    # Different inputs map to different clouds (row fan-out is not mixed
    # up by the padding).
    flat = [tuple(np.round(v[:2].ravel(), 4)) for v in results.values()]
    assert len(set(flat)) == len(flat)
    assert server.stats.snapshot()["served"] == before + 6


def test_stablehlo_artifact_roundtrip_and_serves(tmp_path):
    """--format stablehlo: the frozen jax.export artifact reproduces the
    deploy-folded forward at multiple batch sizes (symbolic batch dim),
    loads without fenet model code, and serves through make_server's
    auto-detected artifact path."""
    import jax.numpy as jnp

    from fenet.cli.export_deploy import main as export_main
    from fenet.models.generator import Generator, init_variables, to_deploy
    from fenet.serve.artifact import load_artifact
    from fenet.train.checkpoint import save_checkpoint

    gen = Generator(num_points=256, backbone="RepVGG-TEST",
                    fine_width=16, mid_width=8)
    rng = np.random.RandomState(3)
    variables = init_variables(
        gen, rng.rand(1, 128, 128, 3).astype(np.float32))
    save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"], "epoch": 1},
        True, "t", str(tmp_path), 1,
    )
    out = export_main([
        "--model", str(tmp_path), "--backbone", "RepVGG-TEST",
        "--num_points", "256", "--fine_width", "16", "--mid_width", "8",
        "--format", "stablehlo", "--platforms", "cpu",
        "--out", str(tmp_path / "deploy.stablehlo"),
    ])
    assert out.endswith(".stablehlo")
    sidecar = json.load(open(out + ".json"))
    assert sidecar["num_points"] == 256 and sidecar["format"] == "stablehlo"

    call, meta = load_artifact(out)
    assert meta["dtype"] == "float32"
    dgen, dvars = to_deploy(
        gen, {"params": variables["params"],
              "batch_stats": variables["batch_stats"]})
    for bs in (2, 5):  # two batch sizes through ONE exported program
        img = rng.randint(0, 256, (bs, 128, 128, 3)).astype(np.uint8)
        got = np.asarray(call(img))
        _, _, ref = dgen.apply(dvars, jnp.asarray(img, jnp.float32),
                               train=False)
        assert got.shape == (bs, 256, 3)
        np.testing.assert_allclose(got, np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)

    # Serve straight from the artifact (auto-detected by suffix).
    from fenet.serve.server import make_server

    server = make_server(out, port=0, max_batch=4, window_ms=2.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        resp = json.load(urllib.request.urlopen(
            urllib.request.Request(base + "/predict",
                                   data=_png_bytes(seed=9)),
            timeout=120,
        ))
        pts = np.asarray(resp["points"], np.float32)
        assert pts.shape == (256, 3) and np.all(np.isfinite(pts))
    finally:
        server.shutdown()
        server.batcher.close()


def test_stablehlo_artifact_bf16_weights_roundtrip(tmp_path):
    """bf16 artifacts store weight leaves as uint16 bit patterns (numpy
    cannot serialize ml_dtypes): the loader must reconstruct exact bf16
    weights and the program must run them."""
    import jax.numpy as jnp

    from fenet.models.generator import Generator, init_variables, to_deploy
    from fenet.serve.artifact import export_artifact, load_artifact

    gen = Generator(num_points=256, backbone="RepVGG-TEST",
                    fine_width=16, mid_width=8)
    rng = np.random.RandomState(5)
    variables = init_variables(
        gen, rng.rand(1, 128, 128, 3).astype(np.float32))
    dgen, dvars = to_deploy(
        gen, {"params": variables["params"],
              "batch_stats": variables["batch_stats"]},
        dtype=jnp.bfloat16,
    )
    out = str(tmp_path / "m.stablehlo")
    meta = export_artifact(dgen, dvars, out, platforms=("cpu",))
    assert meta["dtype"] == "bfloat16"

    call, side = load_artifact(out)
    img = rng.randint(0, 256, (2, 128, 128, 3)).astype(np.uint8)
    got = np.asarray(call(img)).astype(np.float32)
    _, _, ref = dgen.apply(dvars, jnp.asarray(img, jnp.bfloat16),
                           train=False)
    ref = np.asarray(ref).astype(np.float32)
    assert got.shape == (2, 256, 3) and np.all(np.isfinite(got))
    # Exact bf16 weight reconstruction -> same-program outputs agree to
    # bf16 resolution.
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 2e-2


def test_stablehlo_artifact_multidevice_serving(tmp_path):
    """load_artifact(mesh=...): the single-device exported program replayed
    per shard under shard_map (weights replicated, batch split) matches the
    single-device replay exactly, and build_forward_artifact rounds
    max_batch up to the device count (ADVICE r4 #1: artifact serving must
    not silently run at 1/n throughput on a multi-chip host)."""
    import jax

    from fenet.models.generator import Generator, init_variables, to_deploy
    from fenet.parallel.mesh import make_mesh
    from fenet.serve.artifact import (
        build_forward_artifact, export_artifact, load_artifact,
    )

    gen = Generator(num_points=256, backbone="RepVGG-TEST",
                    fine_width=16, mid_width=8)
    rng = np.random.RandomState(7)
    variables = init_variables(
        gen, rng.rand(1, 128, 128, 3).astype(np.float32))
    dgen, dvars = to_deploy(
        gen, {"params": variables["params"],
              "batch_stats": variables["batch_stats"]})
    out = str(tmp_path / "m.stablehlo")
    export_artifact(dgen, dvars, out, platforms=("cpu",))

    mesh = make_mesh(4)
    single, _ = load_artifact(out)
    multi, _ = load_artifact(out, mesh=mesh)
    img = rng.randint(0, 256, (8, 128, 128, 3)).astype(np.uint8)
    got_multi = np.asarray(multi(img))
    got_single = np.asarray(single(img))
    assert got_multi.shape == (8, 256, 3)
    # Same program, same weights; per-shard replay recompiles at the shard
    # batch shape so fusion order can differ by ulps.
    scale = np.max(np.abs(got_single)) + 1e-9
    assert np.max(np.abs(got_multi - got_single)) / scale < 1e-5
    # The jitted call really is batch-sharded over the mesh.
    sharded = multi(jax.device_put(
        img, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("batch"))))
    assert len(sharded.sharding.device_set) == 4

    fwd, meta = build_forward_artifact(out, max_batch=6, mesh=mesh)
    assert meta["max_batch"] == 8 and meta["devices"] == 4  # rounded up
    got = np.asarray(fwd(img))
    assert np.max(np.abs(got - got_single)) / scale < 1e-5
