"""Point-axis ("sequence") parallelism: ring-sharded Chamfer vs the dense op.

Runs on the suite's 8 virtual CPU devices (conftest). Shapes stay tiny:
XLA's in-process CPU collective rendezvous kills the process if partitions
arrive >40s apart on this single-core host.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fenet.ops.chamfer import chamfer_distance, chamfer_distance_ref
from fenet.parallel.sp import (
    POINT_AXIS,
    make_point_mesh,
    make_sharded_chamfer,
    shard_points,
)

D = 4


def _clouds(n, m, b=2, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.rand(b, n, 3).astype(np.float32),
        rng.rand(b, m, 3).astype(np.float32),
    )


def test_ring_chamfer_matches_dense_forward():
    mesh = make_point_mesh(D)
    x1, x2 = _clouds(64, 64)
    chamfer = make_sharded_chamfer(mesh)
    d1, d2, i1, i2 = chamfer(jnp.asarray(x1), jnp.asarray(x2))
    r1, r2, j1, j2 = chamfer_distance_ref(jnp.asarray(x1), jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(j1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(j2))


def test_ring_chamfer_asymmetric_and_presharded():
    """N != M, and inputs already point-sharded on the mesh."""
    mesh = make_point_mesh(D)
    x1, x2 = _clouds(64, 32, seed=1)
    sh = shard_points({"a": jnp.asarray(x1), "b": jnp.asarray(x2)}, mesh)
    chamfer = make_sharded_chamfer(mesh)
    d1, d2, i1, i2 = chamfer(sh["a"], sh["b"])
    r1, r2, j1, j2 = chamfer_distance_ref(jnp.asarray(x1), jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(j1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(j2))


def test_ring_chamfer_tie_break_is_first_minimum():
    """Duplicate targets on different shards: the LOWEST global index must
    win, exactly like a full-axis argmin (ring order must not leak)."""
    mesh = make_point_mesh(D)
    x1, x2 = _clouds(8, 32, b=1, seed=2)
    # Place the same target point on shards 0, 2 and 3 (m_loc = 8).
    x2[0, 0] = x2[0, 17] = x2[0, 29] = [0.5, 0.5, 0.5]
    x1[0, 3] = [0.5, 0.5, 0.5]  # its NN is exactly that duplicate
    chamfer = make_sharded_chamfer(mesh)
    _, _, i1, _ = chamfer(jnp.asarray(x1), jnp.asarray(x2))
    _, _, j1, _ = chamfer_distance_ref(jnp.asarray(x1), jnp.asarray(x2))
    assert int(np.asarray(i1)[0, 3]) == 0
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(j1))


def test_ring_chamfer_gradients_match_dense():
    """Both clouds' gradients (incl. the cross-shard ring scatter) match the
    dense custom-vjp op (chamfer3D.cu:155-174 semantics)."""
    mesh = make_point_mesh(D)
    x1, x2 = _clouds(32, 32, seed=3)
    rng = np.random.RandomState(4)
    w1 = jnp.asarray(rng.rand(2, 32).astype(np.float32))
    w2 = jnp.asarray(rng.rand(2, 32).astype(np.float32))
    chamfer = make_sharded_chamfer(mesh)

    def loss_sp(a, b):
        d1, d2, _, _ = chamfer(a, b)
        return jnp.sum(d1 * w1) + jnp.sum(d2 * w2)

    def loss_dense(a, b):
        d1, d2, _, _ = chamfer_distance(a, b)
        return jnp.sum(d1 * w1) + jnp.sum(d2 * w2)

    ga = jax.grad(loss_sp, argnums=(0, 1))(jnp.asarray(x1), jnp.asarray(x2))
    gb = jax.grad(loss_dense, argnums=(0, 1))(
        jnp.asarray(x1), jnp.asarray(x2)
    )
    for s, d in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(s), np.asarray(d), rtol=1e-5,
                                   atol=1e-6)
