"""Production serving for deploy-folded fenet models.

The reference has no serving story at all — inference is reachable only
through its eval scripts (testnet.py:28-79), one sample at a time, with a
dataset on disk. This package is the deployment-side runtime the goal
statement asks for: a micro-batching scheduler that keeps the TPU fed
with one statically-shaped compiled program, and a dependency-free HTTP
front end (`python -m fenet.cli.serve`).

Design (TPU-first):

- **One compiled program.** Requests are padded to a fixed ``max_batch``
  and run through a single jitted deploy-folded forward — no shape
  churn, no retraces, dp-sharded over every local device exactly like
  ``fenet.cli.predict``.
- **Micro-batching.** A background dispatcher drains the request queue
  every ``window_ms`` (or immediately when a full batch is waiting):
  at production request rates the TPU sees large batches (its
  throughput regime, ~19k img/s at b256 on v5e), while an idle server
  degrades to single-request latency + the window.
- **Precision follows the artifact.** The export sidecar's dtype
  (fp32 or bf16 — ``export_deploy --dtype``) drives the forward; the
  response is always fp32 coordinates.
- **Frozen artifact option.** ``export_deploy --format stablehlo``
  serializes the whole folded forward via ``jax.export`` — program +
  weights in one file, symbolic batch, tpu+cpu lowerings — so the
  serving fleet needs only jax, not fenet (``fenet.serve.artifact``;
  auto-detected by ``fenet.cli.serve`` from the ``.stablehlo`` suffix).
  The program is exported for ONE device; on multi-chip hosts the
  loader replays it per shard under ``shard_map`` (weights replicated,
  batch split), so artifact serving dp-shards over every local device
  just like the flax checkpoint path (``build_forward``).
"""

from fenet.serve.batcher import MicroBatcher  # noqa: F401
