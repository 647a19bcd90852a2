"""Pytest wrapper for the real-chip kernel smoke subset (tpu_smoke.py).

The CPU suite runs kernels in interpret mode, which skips Mosaic lowering —
the gap that shipped the round-3 Sinkhorn g-layout bug. These tests run the
same production-shape checks (one per CHECKS entry) through pytest when the suite targets real
hardware::

    FENET_TEST_PLATFORM=axon python -m pytest tests/test_tpu_smoke.py -v

On the default CPU backend every test skips (the standalone
``python tpu_smoke.py`` script is the per-round runner and writes the
TPU_SMOKE.json artifact; this wrapper just makes the subset addressable
from pytest).
"""

import os
import sys

import jax
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from tpu_smoke import CHECKS  # noqa: E402

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="real-TPU smoke subset (set FENET_TEST_PLATFORM=axon)",
)


@pytest.mark.parametrize(
    "name,check", CHECKS, ids=[name for name, _ in CHECKS]
)
def test_tpu_smoke(name, check):
    detail = check()
    assert isinstance(detail, dict) and detail, (name, detail)
