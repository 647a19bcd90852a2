"""Dependency-free HTTP serving front end for a deploy artifact.

``python -m fenet.cli.serve --deploy_ckpt .../model_deploy.ckpt`` brings
up a threaded stdlib HTTP server whose handlers enqueue into one
:class:`fenet.serve.batcher.MicroBatcher` — concurrent requests are
fused into padded fixed-size device batches (the TPU's throughput
regime) while the wire protocol stays single-image.

Endpoints:

- ``GET /healthz``  -> ``{"status": "ok", ...model metadata}``
- ``GET /stats``    -> served/error counters
- ``POST /predict`` -> body: PNG/JPG bytes; response: ``{"points":
  [[x, y, z], ...]}`` (or binary PLY with ``?format=ply``)

The reference repository has no serving entry point of any kind (its
only inference surface is the dataset-bound eval scripts,
testnet.py:28-79).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def build_forward(deploy_ckpt: str, max_batch: int):
    """(forward, meta): the dp-sharded jitted deploy forward at the fixed
    serving batch, plus the artifact metadata. Mirrors fenet.cli.predict:
    params replicated, batch axis sharded, inputs upcast on device to the
    artifact's dtype."""
    import jax

    from fenet.cli.export_deploy import load_deploy_checkpoint
    from fenet.parallel.mesh import make_mesh, replicate, shard_batch

    gen, variables, dtype = load_deploy_checkpoint(deploy_ckpt)
    mesh = make_mesh()
    variables = jax.device_put(variables, replicate(mesh))
    # Even shards: the fixed serving batch must divide over the mesh
    # (same rounding as fenet.cli.predict).
    n_dev = int(mesh.devices.size)
    max_batch = -(-max_batch // n_dev) * n_dev

    @jax.jit
    def fwd(v, images):
        _, _, pc = gen.apply(v, images.astype(dtype), train=False)
        return pc

    def forward(images: np.ndarray):
        # Returns the in-flight device array (jax async dispatch): the
        # MicroBatcher fetches it only after the NEXT batch is dispatched,
        # overlapping this batch's compute with the next one's
        # host->device transfer (depth-1 pipeline, batcher.py).
        sharded = shard_batch({"image": images.astype(np.uint8)}, mesh)
        return fwd(variables, sharded["image"])

    meta = {"num_points": gen.num_points, "backbone": gen.backbone,
            "dtype": np.dtype(dtype).name, "max_batch": max_batch,
            "devices": int(mesh.devices.size)}
    return forward, meta


class _Stats:
    def __init__(self):
        self.lock = threading.Lock()
        self.served = 0
        self.errors = 0

    def bump(self, ok: bool):
        with self.lock:
            if ok:
                self.served += 1
            else:
                self.errors += 1

    def snapshot(self):
        with self.lock:
            return {"served": self.served, "errors": self.errors}


def make_server(deploy_ckpt: str, host: str = "127.0.0.1", port: int = 8471,
                max_batch: int = 32, window_ms: float = 5.0,
                forward=None, meta: Optional[dict] = None):
    """A ready-to-serve ThreadingHTTPServer (caller runs serve_forever()).

    ``forward``/``meta`` may be injected for tests; by default they come
    from :func:`build_forward`. The server owns a MicroBatcher; shut down
    with ``server.shutdown()`` + ``server.batcher.close()``."""
    from fenet.serve.batcher import MicroBatcher

    if forward is None:
        from fenet.serve.artifact import ARTIFACT_SUFFIX

        if deploy_ckpt.endswith(ARTIFACT_SUFFIX):
            # The frozen StableHLO program was exported for ONE device;
            # build_forward_artifact replays it per shard under shard_map
            # on multi-device hosts (weights replicated, batch split), so
            # both branches dp-shard and both round max_batch up.
            from fenet.serve.artifact import build_forward_artifact

            forward, meta = build_forward_artifact(deploy_ckpt, max_batch)
        else:
            forward, meta = build_forward(deploy_ckpt, max_batch)
        max_batch = meta["max_batch"]  # rounded up to the device count
    batcher = MicroBatcher(forward, max_batch=max_batch,
                           window_ms=window_ms)
    stats = _Stats()
    srv_meta = dict(meta or {})

    class Handler(BaseHTTPRequestHandler):
        # Quiet by default: the access log goes through the fenet logger
        # owner (the CLI), not stderr-per-request.
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802 (stdlib API)
            from urllib.parse import urlsplit

            path = urlsplit(self.path).path
            if path == "/healthz":
                self._reply_json(200, {"status": "ok", **srv_meta})
            elif path == "/stats":
                self._reply_json(200, stats.snapshot())
            else:
                self._reply_json(404, {"error": "unknown path"})

        def do_POST(self):  # noqa: N802
            from urllib.parse import parse_qs, urlsplit

            url = urlsplit(self.path)
            if url.path != "/predict":
                self._reply_json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length)
                import cv2

                from fenet.utils.images import normalize_rgb

                bgr = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                   cv2.IMREAD_COLOR)
                if bgr is None:
                    self._reply_json(400, {"error": "undecodable image"})
                    stats.bump(False)
                    return
                img = normalize_rgb(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
                cloud = batcher.submit(img.astype(np.uint8)).result(
                    timeout=120.0
                )
            except Exception as e:  # pragma: no cover - network edges
                self._reply_json(500, {"error": str(e)[:300]})
                stats.bump(False)
                return
            if parse_qs(url.query).get("format", ["json"])[0] == "ply":
                import io

                import tempfile

                from fenet.utils.ply import export_pointcloud

                with tempfile.NamedTemporaryFile(suffix=".ply") as f:
                    export_pointcloud(cloud, f.name, as_text=False)
                    body = open(f.name, "rb").read()
                self._reply(200, body, "application/octet-stream")
            else:
                self._reply_json(200, {"points": cloud.tolist()})
            stats.bump(True)

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher
    server.stats = stats
    server.meta = srv_meta
    return server
