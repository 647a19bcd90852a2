"""Chamfer op: property tests vs numpy/torch oracles + gradient checks.

Oracle pattern follows the reference's own pure-tensor CD
(loss/loss_.py:66-91) and its CUDA self-test (metric/chamfer3D/test.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenet.ops.chamfer import (
    _nn_pallas,
    _nn_pallas_stream,
    chamfer_distance,
    chamfer_distance_ref,
)

pytestmark = pytest.mark.fast  # core tier: `pytest -m fast` (<5 min warm)


def _numpy_chamfer(a, b):
    d = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)  # (B,N,M)
    return d.min(2), d.min(1), d.argmin(2), d.argmin(1)


@pytest.mark.parametrize("n,m", [(128, 128), (1000, 2000), (257, 129)])
def test_matches_numpy_oracle(n, m):
    rng = np.random.RandomState(0)
    a = rng.rand(4, n, 3).astype(np.float32)
    b = rng.rand(4, m, 3).astype(np.float32)
    d1, d2, i1, i2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    nd1, nd2, ni1, ni2 = _numpy_chamfer(a, b)
    np.testing.assert_allclose(np.asarray(d1), nd1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), nd2, rtol=1e-4, atol=1e-5)
    # Indices must point at (near-)minimal rows even under fp reassociation.
    bidx = np.arange(4)[:, None]
    np.testing.assert_allclose(
        ((a - b[bidx, np.asarray(i1)]) ** 2).sum(-1), nd1, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        ((b - a[bidx, np.asarray(i2)]) ** 2).sum(-1), nd2, rtol=1e-4, atol=1e-5
    )


def test_pallas_interpret_matches_ref():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(2, 512, 3), jnp.float32)
    b = jnp.asarray(rng.rand(2, 640, 3), jnp.float32)
    d_ref, i_ref = (
        chamfer_distance_ref(a, b)[0],
        chamfer_distance_ref(a, b)[2],
    )
    d_pal, i_pal = _nn_pallas(a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


@pytest.mark.parametrize("n,m", [(512, 2048), (300, 1500)])
def test_pallas_stream_interpret_matches_ref(n, m):
    """Streaming kernel (B-cloud tiled over an inner grid axis with a
    running min/argmin) against the XLA oracle, including ragged shapes
    that exercise the global pad-column mask and the cross-tile argmin
    offset."""
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.rand(2, n, 3), jnp.float32)
    b = jnp.asarray(rng.rand(2, m, 3), jnp.float32)
    d_ref, i_ref = chamfer_distance_ref(a, b)[0], chamfer_distance_ref(a, b)[2]
    d_pal, i_pal = _nn_pallas_stream(a, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_pallas_stream_interpret_beyond_vmem_cap():
    """The round-3 cap lift: M = N = 16384 — 4x beyond the resident
    kernel's 8192 VMEM cap (chamfer3D.cu:13's shared-memory analog). The
    (N, M) matrix would be 1 GB; the streaming kernel never materializes
    it. Verified against the oracle on a thin batch."""
    rng = np.random.RandomState(4)
    n = 16384
    a = jnp.asarray(rng.rand(1, n, 3), jnp.float32)
    b = jnp.asarray(rng.rand(1, n, 3), jnp.float32)
    d_ref, _, i_ref, _ = chamfer_distance_ref(a, b)
    d_pal, i_pal = _nn_pallas_stream(a, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_gradient_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    a_np = rng.rand(2, 64, 3).astype(np.float32)
    b_np = rng.rand(2, 96, 3).astype(np.float32)

    # Independent torch oracle (autograd through an explicit pairwise min).
    ta = torch.tensor(a_np, requires_grad=True)
    tb = torch.tensor(b_np, requires_grad=True)
    d = ((ta[:, :, None, :] - tb[:, None, :, :]) ** 2).sum(-1)
    loss = d.min(2).values.mean() + d.min(1).values.mean()
    loss.backward()

    def jloss(a, b):
        d1, d2, _, _ = chamfer_distance(a, b)
        return jnp.mean(d1) + jnp.mean(d2)

    ga, gb = jax.grad(jloss, argnums=(0, 1))(jnp.asarray(a_np), jnp.asarray(b_np))
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), tb.grad.numpy(), rtol=1e-3, atol=1e-5)


def test_symmetry_and_zero_self_distance():
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.rand(2, 100, 3), jnp.float32)
    d1, d2, i1, i2 = chamfer_distance(a, a)
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.arange(100)[None].repeat(2, 0))
