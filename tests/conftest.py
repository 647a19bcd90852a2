"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on fake CPU devices
(``--xla_force_host_platform_device_count``); the real single TPU chip is
exercised by bench.py and the driver's compile checks, not the unit suite.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the dev box exposes a real
# TPU chip; set FENET_TEST_PLATFORM=axon to run the suite against it — the
# chip registers through the experimental 'axon' platform, and forcing the
# literal 'tpu' plugin fails with "No jellyfish device found").
os.environ["JAX_PLATFORMS"] = os.environ.get("FENET_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The dev image's sitecustomize imports jax before conftest runs, so the env
# var alone is too late — update the already-captured config flag as well.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", False)

# Persistent CPU-scoped compile cache: the suite's wall time is dominated by
# XLA CPU compiles of the big fused train/eval steps (minutes each on a
# 1-core sandbox), which are identical run to run.  Scoped to a 'cpu'
# subdirectory — TPU AOT entries in the same dir caused a libtpu version-
# mismatch crash in round 1.  Caveat learned the hard way: cache-loaded
# executables still pay cold collective-infra setup on their FIRST
# collective execution; the suite tolerates this because its first sharded
# steps run on 2-device meshes (spread stays under XLA's hard-coded 40s
# in-process rendezvous watchdog).
from fenet.utils.compilation_cache import enable  # noqa: E402

# On-chip runs (FENET_TEST_PLATFORM=axon) share the DEFAULT cache dir with
# bench.py / the CLI drivers — same platform, so their compiled programs
# are valid hits here (a first pytest-on-chip run otherwise recompiles
# everything: measured 9:44 vs ~5 min for the cached smoke script).
_plat = os.environ["JAX_PLATFORMS"]
enable(platform="cpu" if _plat == "cpu" else None)
