"""Serve a deploy artifact over HTTP (see fenet.serve).

Example:
    python -m fenet.cli.export_deploy --model .../checkpoints/ \\
        --category 02828884 --dtype bfloat16
    python -m fenet.cli.serve --deploy_ckpt .../model_deploy.ckpt \\
        --port 8471 --max_batch 64
    curl -s --data-binary @chair.png localhost:8471/predict | jq .points

The reference has no serving entry point (inference only via its eval
scripts, testnet.py:28-79).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--deploy_ckpt", type=str, required=True,
                        help="folded serving checkpoint written by "
                             "fenet.cli.export_deploy; a *.stablehlo "
                             "frozen artifact (--format stablehlo) is "
                             "auto-detected and served via jax.export "
                             "deserialize (fenet.serve.artifact)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8471)
    parser.add_argument("--max_batch", type=int, default=32,
                        help="fixed device batch (requests are "
                             "micro-batched and padded to it)")
    parser.add_argument("--window_ms", type=float, default=5.0,
                        help="micro-batching window; 0 = dispatch "
                             "immediately")
    opt = parser.parse_args(argv)

    from fenet.serve.server import make_server
    from fenet.utils.logger import get_logger

    import os

    logger = get_logger(
        os.path.join(os.path.dirname(opt.deploy_ckpt) or ".", "serving.log")
    )
    server = make_server(opt.deploy_ckpt, host=opt.host, port=opt.port,
                         max_batch=opt.max_batch, window_ms=opt.window_ms)
    logger.info("serving %s on http://%s:%d (max_batch=%d, %s)",
                opt.deploy_ckpt, opt.host, opt.port, opt.max_batch,
                server.meta)

    # Production shutdown: SIGTERM (the orchestrator's stop signal) drains
    # like Ctrl-C — in-flight batches resolve, then the listener closes.
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down (drain + close)")
    finally:
        server.shutdown()
        server.batcher.close()
    return 0


if __name__ == "__main__":
    main()
