"""Persistent XLA compilation cache setup.

Program compiles go through a remote-compile service on this TPU setup and
can take minutes for the big fused eval/train steps; the persistent cache
makes every shape compile once per machine. Called by bench.py and the CLI
drivers before any jit executes.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/fenet_jax_cache")


def enable(cache_dir: str | None = None, *, platform: str | None = None) -> None:
    """Enable the persistent compile cache.

    ``platform`` scopes the cache directory to a sub-directory (e.g.
    ``cpu``): cache entries embed platform-specific AOT artifacts, and
    sharing one directory between the axon TPU backend and a forced-CPU run
    produced a libtpu AOT version-mismatch in round 1.  Pass the platform
    whenever the run forces a non-default backend.
    """
    import jax

    path = cache_dir or os.environ.get("FENET_JAX_CACHE", DEFAULT_DIR)
    if platform:
        path = os.path.join(path, platform)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
