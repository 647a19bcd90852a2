"""Multi-host initialization: a REAL two-process jax.distributed cluster.

The reference is single-process (SURVEY.md §2.3); fenet.parallel.distributed
is first-class here. This test spawns two fresh interpreters that form a
2-process JAX "cluster" over a local coordinator (process 0), each
contributing one CPU device, and runs a cross-process allgather — the same
control plane a multi-host TPU slice uses, minus ICI. Also covers the
wrapper's single-host no-op guard in-process.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from fenet.parallel.distributed import initialize

    pid = int(sys.argv[1])
    initialize(coordinator_address=sys.argv[2], num_processes=2,
               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert len(jax.local_devices()) == 1

    import numpy as np
    from jax.experimental import multihost_utils

    got = multihost_utils.process_allgather(np.array([float(pid + 1)]))
    np.testing.assert_allclose(np.asarray(got).ravel(), [1.0, 2.0])
    print(f"DIST_OK {{pid}}", flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_allgather(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD.format(repo=REPO))
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed children timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"DIST_OK {pid}" in out, out


def test_single_host_noop(monkeypatch):
    """Without a coordinator (args or env), initialize must be a no-op —
    calling jax.distributed.initialize on an already-running single process
    would raise."""
    from fenet.parallel import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    called = []
    import jax

    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: called.append(kw),
    )
    distributed.initialize()
    assert called == []
    distributed.initialize(coordinator_address="host:1", num_processes=2,
                           process_id=0)
    assert called == [
        {"coordinator_address": "host:1", "num_processes": 2,
         "process_id": 0}
    ]
