"""FPS vs an independent numpy oracle of the reference algorithm."""

import jax.numpy as jnp
import numpy as np

from fenet.ops.fps import farthest_point_sample, index_points

import pytest

pytestmark = pytest.mark.fast  # core tier: `pytest -m fast` (<5 min warm)


def _numpy_fps(xyz, npoint, start):
    n = xyz.shape[0]
    centroids = np.zeros(npoint, np.int64)
    distance = np.full(n, 1e10)
    farthest = start
    for i in range(npoint):
        centroids[i] = farthest
        d = ((xyz - xyz[farthest]) ** 2).sum(-1)
        distance = np.minimum(distance, d)
        farthest = int(distance.argmax())
    return centroids


def test_matches_numpy_oracle_both_seeds():
    rng = np.random.RandomState(0)
    xyz = rng.rand(2, 200, 3).astype(np.float32)
    for ran, start in [(True, 0), (False, 1)]:
        got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 64, ran=ran))
        for b in range(2):
            np.testing.assert_array_equal(got[b], _numpy_fps(xyz[b], 64, start))


def test_index_points_gathers():
    rng = np.random.RandomState(1)
    pts = rng.rand(2, 50, 3).astype(np.float32)
    idx = rng.randint(0, 50, size=(2, 7))
    out = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], pts[b][idx[b]])
