"""Device proposal kernel tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bcm3_tpu.sampler import proposal as pm
from bcm3_tpu.stats.gmm import GMM


def _reference_reflect(x, lb, ub):
    """Direct transcription of the reflection loop semantics
    (reference: Proposal.cpp:385-397) as a numpy oracle."""
    while True:
        if x < lb:
            x = lb + (lb - x)
        elif x > ub:
            x = ub - (x - ub)
        else:
            return x


def test_reflect_on_bounds_matches_loop():
    rng = np.random.default_rng(0)
    lb, ub = -1.0, 2.0
    xs = rng.uniform(-20, 20, 500)
    expected = np.array([_reference_reflect(x, lb, ub) for x in xs])
    got = np.asarray(pm.reflect_on_bounds(jnp.asarray(xs), lb, ub))
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_reflect_unbounded_passthrough():
    xs = jnp.asarray([-5.0, 0.0, 7.0])
    got = np.asarray(pm.reflect_on_bounds(xs, -jnp.inf, jnp.inf))
    np.testing.assert_allclose(got, [-5.0, 0.0, 7.0])


def test_reflect_one_sided():
    assert float(pm.reflect_on_bounds(jnp.asarray(-1.0), 0.0, jnp.inf)) == 1.0
    assert float(pm.reflect_on_bounds(jnp.asarray(3.0), -jnp.inf, 2.0)) == 1.0
    assert float(pm.reflect_on_bounds(jnp.asarray(0.5), 0.0, jnp.inf)) == 0.5


def _build_prop(gmms, d, ptype="gaussian_mixture", t_dof=0.0):
    return pm.build_block_proposal(gmms, len(gmms), d, jnp.float64, t_dof, ptype)


def test_single_gaussian_mh_ratio_is_zero():
    gmm = GMM.from_params(np.zeros((1, 2)), np.eye(2)[None], np.ones(1))
    prop = _build_prop([gmm], 2)
    slice0 = jax.tree_util.tree_map(lambda a: a[0], prop)
    mh = pm.mh_log_ratio(slice0, jnp.asarray([0.3, -0.2]), jnp.asarray([1.0, 0.5]))
    np.testing.assert_allclose(float(mh), 0.0, atol=1e-12)


def test_mixture_mh_ratio_matches_reference_formula():
    """Oracle: direct transcription of ProposalGaussianMixture::CalculateMHRatio
    (reference: ProposalGaussianMixture.cpp:44-63)."""
    rng = np.random.default_rng(1)
    means = np.array([[0.0, 0.0], [3.0, 1.0]])
    covs = np.array([np.eye(2), [[1.5, 0.3], [0.3, 0.8]]])
    w = np.array([0.4, 0.6])
    gmm = GMM.from_params(means, covs, w)
    prop = _build_prop([gmm], 2)
    slice0 = jax.tree_util.tree_map(lambda a: a[0], prop)
    scales = np.asarray(slice0.scales)

    x = np.array([0.5, 0.2])
    xn = np.array([2.0, 0.9])

    def logsum(arr):
        m = np.max(arr)
        return m + np.log(np.sum(np.exp(arr - m)))

    fwd_resp = gmm.responsibilities(x)
    rev_resp = gmm.responsibilities(xn)
    fwd = []
    rev = []
    from scipy.linalg import solve_triangular

    for i in range(2):
        v = (xn - x) / scales[i]
        s = solve_triangular(gmm.chols[i], v, lower=True)
        fwd.append(
            -np.log(scales[i] ** 2) + gmm.log_c[i] - 0.5 * s @ s + np.log(fwd_resp[i])
        )
        s2 = solve_triangular(gmm.chols[i], -v, lower=True)
        rev.append(
            -np.log(scales[i] ** 2) + gmm.log_c[i] - 0.5 * s2 @ s2 + np.log(rev_resp[i])
        )
    expected = logsum(np.array(rev)) - logsum(np.array(fwd))

    got = float(pm.mh_log_ratio(slice0, jnp.asarray(x), jnp.asarray(xn)))
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_propose_stays_in_bounds():
    gmm = GMM.from_params(np.zeros((1, 2)), 4 * np.eye(2)[None], np.ones(1))
    prop = _build_prop([gmm], 2)
    slice0 = jax.tree_util.tree_map(lambda a: a[0], prop)
    lower = jnp.asarray([-1.0, -1.0])
    upper = jnp.asarray([1.0, 1.0])
    for i in range(50):
        key = jax.random.PRNGKey(i)
        nb, sel = pm.propose(slice0, jnp.asarray([0.0, 0.0]), lower, upper, key)
        assert np.all(np.asarray(nb) >= -1.0) and np.all(np.asarray(nb) <= 1.0)
        assert int(sel) == 0


def test_scale_adaptation_direction():
    gmm = GMM.from_params(np.zeros((1, 1)), np.eye(1)[None], np.ones(1))
    prop = _build_prop([gmm], 1)
    slice0 = jax.tree_util.tree_map(lambda a: a[0], prop)
    import dataclasses

    # low acceptance EMA -> scale shrinks
    low = dataclasses.replace(
        slice0,
        acc_ema=jnp.asarray([0.01]),
        selected=jnp.asarray(0, dtype=jnp.int32),
    )
    s0 = float(low.scales[0])
    out = pm.update_scales(low, jax.random.PRNGKey(0))
    assert float(out.scales[0]) < s0

    # high acceptance EMA -> scale grows
    high = dataclasses.replace(
        slice0,
        acc_ema=jnp.asarray([0.99]),
        selected=jnp.asarray(0, dtype=jnp.int32),
    )
    out = pm.update_scales(high, jax.random.PRNGKey(0))
    assert float(out.scales[0]) > s0

    # no previous selection -> unchanged
    none = dataclasses.replace(
        slice0,
        acc_ema=jnp.asarray([0.01]),
        selected=jnp.asarray(-1, dtype=jnp.int32),
    )
    out = pm.update_scales(none, jax.random.PRNGKey(0))
    assert float(out.scales[0]) == s0


def test_notify_accepted_ema():
    gmm = GMM.from_params(np.zeros((1, 1)), np.eye(1)[None], np.ones(1))
    prop = _build_prop([gmm], 1)
    slice0 = jax.tree_util.tree_map(lambda a: a[0], prop)
    import dataclasses

    slice0 = dataclasses.replace(slice0, selected=jnp.asarray(0, dtype=jnp.int32))
    ema0 = float(slice0.acc_ema[0])
    up = pm.notify_accepted(slice0, jnp.asarray(True))
    down = pm.notify_accepted(slice0, jnp.asarray(False))
    alpha = 2.0 / (pm.SCALING_EMA_PERIOD + 1.0)
    np.testing.assert_allclose(float(up.acc_ema[0]), ema0 + (1 - ema0) * alpha)
    np.testing.assert_allclose(float(down.acc_ema[0]), ema0 - ema0 * alpha)
