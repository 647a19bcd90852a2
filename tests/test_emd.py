"""EMD auction op: assignment validity + gather-recompute oracle + gradient.

The validity checks mirror the reference's own self-test, which verifies the
returned distances by re-gathering xyz2[assignment] and recomputing in numpy
and inspects assignment uniqueness (metric/emd/test.py:23-28).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from fenet.ops.emd import (
    _emd_pallas,
    earth_mover_distance,
    earth_mover_distance_ref,
)

import pytest

pytestmark = pytest.mark.fast  # core tier: `pytest -m fast` (<5 min warm)


def _make_clouds(b, n, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.rand(b, n, 3).astype(np.float32),
        rng.rand(b, n, 3).astype(np.float32),
    )


def test_dist_matches_gathered_recompute():
    x1, x2 = _make_clouds(3, 256)
    dist, ass = earth_mover_distance(jnp.asarray(x1), jnp.asarray(x2), 0.02, 200)
    ass = np.asarray(ass)
    assert (ass >= 0).all() and (ass < 256).all()
    gathered = x2[np.arange(3)[:, None], ass]
    np.testing.assert_allclose(
        np.asarray(dist), ((x1 - gathered) ** 2).sum(-1), rtol=1e-4, atol=1e-6
    )


def test_assignment_near_bijective_and_near_optimal():
    """With small eps + enough iters the auction should approach the
    Hungarian optimum and be bijective (auction theory: within n*eps)."""
    x1, x2 = _make_clouds(2, 128, seed=1)
    dist, ass = earth_mover_distance(jnp.asarray(x1), jnp.asarray(x2), 0.002, 5000)
    ass = np.asarray(ass)
    for b in range(2):
        assert len(set(ass[b].tolist())) == 128  # bijection
        c = np.linalg.norm(x1[b][:, None] - x2[b][None], axis=-1)
        ri, ci = scipy.optimize.linear_sum_assignment(c)
        opt = c[ri, ci].sum()
        ours = c[np.arange(128), ass[b]].sum()
        assert ours <= opt + 128 * 0.002 + 1e-3, (ours, opt)


def test_identity_clouds_converge_to_zero():
    x1, _ = _make_clouds(2, 256, seed=2)
    dist, ass = earth_mover_distance(jnp.asarray(x1), jnp.asarray(x1), 0.002, 3000)
    # Matched cost should be tiny (eps-suboptimality allows small residue).
    assert float(jnp.sqrt(dist).mean()) < 0.05


def test_pallas_interpret_matches_ref():
    x1, x2 = _make_clouds(1, 256, seed=3)
    d_ref, a_ref = earth_mover_distance_ref(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 60
    )
    d_pal, a_pal = _emd_pallas(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 60, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a_pal), np.asarray(a_ref))
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )


def test_gradient_flows_to_pred_only():
    x1, x2 = _make_clouds(2, 128, seed=4)

    def loss(a, b):
        d, _ = earth_mover_distance(a, b, 0.05, 100)
        return jnp.sqrt(d).mean()

    ga, gb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x1), jnp.asarray(x2))
    assert float(jnp.abs(ga).max()) > 0
    np.testing.assert_array_equal(np.asarray(gb), 0.0)

    # Analytic check: d sqrt(d)/d x1 = (x1 - x2[ass]) / sqrt(d) / (B*N).
    d, ass = earth_mover_distance(jnp.asarray(x1), jnp.asarray(x2), 0.05, 100)
    bidx = np.arange(2)[:, None]
    diff = x1 - x2[bidx, np.asarray(ass)]
    expected = diff / np.maximum(np.sqrt(np.asarray(d))[..., None], 1e-12) / (2 * 128)
    np.testing.assert_allclose(np.asarray(ga), expected, rtol=1e-3, atol=1e-5)


def test_early_exit_iters_insensitive_after_convergence():
    x1, x2 = _make_clouds(1, 128, seed=5)
    d1, a1 = earth_mover_distance(jnp.asarray(x1), jnp.asarray(x2), 0.05, 500)
    d2, a2 = earth_mover_distance(jnp.asarray(x1), jnp.asarray(x2), 0.05, 800)
    # Hitting full assignment stops the loop; more iters change nothing.
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_pallas_streaming_matches_ref_n2048():
    """N=2048 exceeds _MAX_N_IN_VMEM: the kernel takes the streaming branch
    (store_value=False, value chunks recomputed per iteration) — previously
    untested. Interpret mode vs the XLA reference auction."""
    from fenet.ops.emd import _MAX_N_IN_VMEM

    n = 2048
    assert n > _MAX_N_IN_VMEM
    x1, x2 = _make_clouds(1, n, seed=6)
    d_ref, a_ref = earth_mover_distance_ref(
        jnp.asarray(x1), jnp.asarray(x2), 0.1, 20
    )
    d_pal, a_pal = _emd_pallas(
        jnp.asarray(x1), jnp.asarray(x2), 0.1, 20, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a_pal), np.asarray(a_ref))
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )


def test_pallas_scale_phases_matches_ref():
    """Epsilon-scaling (scale_phases=3): phases at eps*25, eps*5, eps with
    carried prices — kernel vs XLA reference, previously untested."""
    x1, x2 = _make_clouds(1, 256, seed=7)
    d_ref, a_ref = earth_mover_distance_ref(
        jnp.asarray(x1), jnp.asarray(x2), 0.02, 80, scale_phases=3
    )
    d_pal, a_pal = _emd_pallas(
        jnp.asarray(x1), jnp.asarray(x2), 0.02, 80, scale_phases=3,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a_pal), np.asarray(a_ref))
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    # scaling must not hurt final quality vs the fixed-eps auction run to
    # convergence at the same final eps
    d_fix, _ = earth_mover_distance_ref(
        jnp.asarray(x1), jnp.asarray(x2), 0.02, 3000
    )
    assert float(jnp.sqrt(d_pal).mean()) <= 1.05 * float(
        jnp.sqrt(d_fix).mean()
    )


def test_adaptive_scaling_skips_phases_for_near_clouds():
    """Near-converged clouds score a HIGH nearest-neighbor competition
    fraction (most gt columns are some pred point's NN), so with
    scale_thresh=0.1 the gate closes: the high-eps phases must be skipped
    and the result bit-identical to the fixed-eps auction (prices start at
    zero, assignments empty), in both the XLA reference and the kernel."""
    rng = np.random.RandomState(10)
    x1 = rng.rand(2, 256, 3).astype(np.float32)
    x2 = (
        x1[:, rng.permutation(256)]
        + rng.randn(2, 256, 3).astype(np.float32) * 0.005
    )
    d_fix, a_fix = earth_mover_distance_ref(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 300
    )
    d_ad, a_ad = earth_mover_distance_ref(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 300, scale_phases=3,
        scale_thresh=0.1,
    )
    np.testing.assert_array_equal(np.asarray(a_ad), np.asarray(a_fix))
    np.testing.assert_array_equal(np.asarray(d_ad), np.asarray(d_fix))
    d_pal, a_pal = _emd_pallas(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 300, scale_phases=3,
        scale_thresh=0.1, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a_pal), np.asarray(a_fix))
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_fix), rtol=1e-5, atol=1e-6
    )


def test_adaptive_scaling_runs_phases_for_far_clouds():
    """A clustered cloud fighting over few targets scores a LOW nearest-
    neighbor competition fraction (below the threshold): adaptive mode must
    take the scaling path, matching unconditional scale_phases — and the
    kernel must match the XLA reference."""
    rng = np.random.RandomState(11)
    x1 = (rng.rand(1, 256, 3) * 0.2).astype(np.float32)
    x2 = (rng.rand(1, 256, 3) * 0.2 + 0.7).astype(np.float32)
    d_sc, a_sc = earth_mover_distance_ref(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 300, scale_phases=3
    )
    d_ad, a_ad = earth_mover_distance_ref(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 300, scale_phases=3,
        scale_thresh=0.1,
    )
    np.testing.assert_array_equal(np.asarray(a_ad), np.asarray(a_sc))
    d_pal, a_pal = _emd_pallas(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 300, scale_phases=3,
        scale_thresh=0.1, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a_pal), np.asarray(a_sc))
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_sc), rtol=1e-5, atol=1e-6
    )


def test_adaptive_scaling_gradient_and_facade():
    """custom_vjp arity with the new static arg; facade pass-through."""
    from fenet.losses.facade import emd_loss

    x1, x2 = _make_clouds(2, 128, seed=12)

    def loss(a):
        return emd_loss(a, jnp.asarray(x2), 0.05, 200, 3, True, 0.1)

    g = jax.grad(loss)(jnp.asarray(x1))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_no_early_exit_matches_early_exit_result():
    """early_exit=False (the reference driver's run-all-iters structure,
    emd_cuda.cu:256) must land on the same assignment: post-convergence
    iterations are no-ops."""
    x1, x2 = _make_clouds(2, 256, seed=8)
    d1, a1 = earth_mover_distance(jnp.asarray(x1), jnp.asarray(x2), 0.05, 300)
    d2, a2 = earth_mover_distance(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 300, 1, False
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-7)
    # pallas kernel path too (interpret)
    d3, a3 = _emd_pallas(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 300, 1, False, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a3), np.asarray(a1))


def test_fallback_shapes_warn_once(caplog):
    """On a TPU backend, only N above the streaming ceiling falls back to
    the XLA reference, logging once per shape. Odd N (padded into the
    kernel since round 5) must NOT warn — it is the same code path."""
    import logging

    from fenet.ops import emd as emd_mod

    orig = jax.default_backend
    orig_ceiling = emd_mod._MAX_N_STREAMING
    emd_mod._warned_fallback.clear()
    jax.default_backend = lambda: "tpu"
    emd_mod._MAX_N_STREAMING = 128  # keep the oversized case CPU-cheap
    try:
        with caplog.at_level(logging.WARNING, logger="fenet.ops.emd"):
            x1, x2 = _make_clouds(1, 200, seed=9)
            emd_mod.earth_mover_distance(
                jnp.asarray(x1), jnp.asarray(x2), 0.05, 20
            )
            emd_mod.earth_mover_distance(
                jnp.asarray(x1), jnp.asarray(x2), 0.05, 20
            )
    finally:
        jax.default_backend = orig
        emd_mod._MAX_N_STREAMING = orig_ceiling
    msgs = [r for r in caplog.records if "Pallas kernel declined" in r.message]
    assert len(msgs) == 1  # once per shape


def test_odd_n_dispatches_to_pallas_on_tpu_backend():
    """N % 256 != 0 under the streaming ceiling takes the kernel path now
    (emd_module.py:36-39 hard-errors there; fenet pads instead)."""
    from fenet.ops import emd as emd_mod

    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        assert emd_mod._use_pallas(1000)
        assert emd_mod._use_pallas(1025)
        assert emd_mod._use_pallas(8192)
        assert not emd_mod._use_pallas(8193)
    finally:
        jax.default_backend = orig


def test_padded_odd_n_matches_ref():
    """The padded kernel must agree with the XLA reference auction run at
    the REAL N: pad points are inert (VERDICT r4 #5). N=1000 pads within
    the VMEM-resident mode; 258 exercises a boundary chunk that mixes real
    and pad rows."""
    for n in (1000, 258):
        x1, x2 = _make_clouds(1, n, seed=20 + n)
        d_ref, a_ref = earth_mover_distance_ref(
            jnp.asarray(x1), jnp.asarray(x2), 0.05, 60
        )
        d_pal, a_pal = _emd_pallas(
            jnp.asarray(x1), jnp.asarray(x2), 0.05, 60, interpret=True
        )
        assert a_pal.shape == (1, n) and d_pal.shape == (1, n)
        ass = np.asarray(a_pal)
        assert (ass >= 0).all() and (ass < n).all()  # never a pad column
        np.testing.assert_array_equal(ass, np.asarray(a_ref))
        np.testing.assert_allclose(
            np.asarray(d_pal), np.asarray(d_ref), rtol=1e-5, atol=1e-6
        )


def test_padded_odd_n_streaming_matches_ref():
    """N=1025 pads to 1280 > _MAX_N_IN_VMEM: the padded run must take the
    streaming branch and still match the XLA reference at the real N."""
    from fenet.ops.emd import _MAX_N_IN_VMEM

    n = 1025
    assert -(-n // 256) * 256 > _MAX_N_IN_VMEM
    x1, x2 = _make_clouds(1, n, seed=21)
    d_ref, a_ref = earth_mover_distance_ref(
        jnp.asarray(x1), jnp.asarray(x2), 0.1, 20
    )
    d_pal, a_pal = _emd_pallas(
        jnp.asarray(x1), jnp.asarray(x2), 0.1, 20, interpret=True
    )
    ass = np.asarray(a_pal)
    assert (ass >= 0).all() and (ass < n).all()
    np.testing.assert_array_equal(ass, np.asarray(a_ref))
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )


def test_padded_adaptive_gate_shape_independent():
    """The NN-competition gate must threshold on the REAL N: near-converged
    odd-N clouds (high competition fraction) keep the gate closed in the
    padded kernel exactly as in the reference, leaving results bit-equal
    to the fixed-eps auction."""
    rng = np.random.RandomState(22)
    n = 300
    x1 = rng.rand(1, n, 3).astype(np.float32)
    x2 = (
        x1[:, rng.permutation(n)]
        + rng.randn(1, n, 3).astype(np.float32) * 0.005
    )
    d_fix, a_fix = earth_mover_distance_ref(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 300
    )
    d_pal, a_pal = _emd_pallas(
        jnp.asarray(x1), jnp.asarray(x2), 0.05, 300, scale_phases=3,
        scale_thresh=0.1, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a_pal), np.asarray(a_fix))
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_fix), rtol=1e-5, atol=1e-6
    )
