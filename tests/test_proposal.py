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


def _random_gmm(rng, k, d):
    means = rng.normal(size=(k, d))
    covs = np.empty((k, d, d))
    for i in range(k):
        a = rng.normal(size=(d, d))
        covs[i] = a @ a.T + d * np.eye(d)
    w = rng.uniform(0.5, 2.0, k)
    return GMM.from_params(means, covs, w / w.sum())


def _shared_layout_prop(rng, E, L, k, d, t_dof=0.0):
    """Shared (L, K, ...) mixture layout with randomized per-chain scales,
    as the engine builds it post-54f942f (one GMM per ladder position)."""
    import dataclasses

    gmms = [_random_gmm(rng, k, d) for _ in range(L)]
    prop = pm.build_block_proposal(
        gmms, E * L, d, jnp.float64, t_dof, "gaussian_mixture"
    )
    scales = jnp.asarray(rng.uniform(0.2, 3.0, size=(E * L, k)))
    return dataclasses.replace(prop, scales=scales)


def _tiled_per_chain(prop, E):
    """Legacy per-chain layout equivalent: tile the (L, ...) mixture fields
    to (C, ...) so the flat-vmapped per-chain kernels apply."""
    import dataclasses

    tile = lambda a: jnp.tile(a, (E,) + (1,) * (a.ndim - 1))
    return dataclasses.replace(
        prop,
        means=tile(prop.means),
        chols=tile(prop.chols),
        inv_chols=tile(prop.inv_chols),
        log_weights=tile(prop.log_weights),
        log_c=tile(prop.log_c),
    )


def test_ensemble_propose_matches_vmapped_per_chain():
    """propose_ensemble must reproduce the vmapped per-chain propose()
    exactly — same RNG stream (identical kk/kz/kg split structure), same
    component selection, same step — for both the Gaussian and the
    t-distributed (t_dof>0) proposal."""
    rng = np.random.default_rng(3)
    E, L, k, d = 7, 4, 3, 5
    C = E * L
    lower = jnp.asarray(rng.uniform(-6, -4, d))
    upper = jnp.asarray(rng.uniform(4, 6, d))
    for t_dof in (0.0, 5.0):
        prop = _shared_layout_prop(rng, E, L, k, d, t_dof)
        x = jnp.asarray(rng.normal(size=(C, d)))
        keys = jax.random.split(jax.random.PRNGKey(11), C)

        nb_e, sel_e, _ = pm.propose_ensemble(
            prop, x.reshape(E, L, d), lower, upper, keys.reshape(E, L, -1)
        )

        flat = _tiled_per_chain(prop, E)
        nb_v, sel_v = jax.vmap(
            lambda p, xb, kk: pm.propose(p, xb, lower, upper, kk)
        )(flat, x, keys)

        np.testing.assert_array_equal(
            np.asarray(sel_e).reshape(C), np.asarray(sel_v)
        )
        np.testing.assert_allclose(
            np.asarray(nb_e).reshape(C, d), np.asarray(nb_v), rtol=1e-12,
            atol=1e-12,
        )


def test_ensemble_mh_ratio_matches_vmapped_per_chain():
    rng = np.random.default_rng(4)
    E, L, k, d = 5, 3, 4, 6
    C = E * L
    prop = _shared_layout_prop(rng, E, L, k, d)
    x = jnp.asarray(rng.normal(size=(C, d)))
    xn = jnp.asarray(rng.normal(size=(C, d)))

    mh_e = pm.mh_log_ratio_ensemble(
        prop, x.reshape(E, L, d), xn.reshape(E, L, d)
    )
    flat = _tiled_per_chain(prop, E)
    mh_v = jax.vmap(pm.mh_log_ratio)(flat, x, xn)
    np.testing.assert_allclose(
        np.asarray(mh_e).reshape(C), np.asarray(mh_v), rtol=1e-11, atol=1e-11
    )


def test_clustered_ensemble_kernels_match_vmapped_per_chain():
    """propose_clustered_ensemble / mh_log_ratio_clustered_ensemble must
    reproduce the vmapped per-chain clustered kernels exactly (identical
    kz/kg split structure, one-hot pick == gather)."""
    rng = np.random.default_rng(5)
    E, L, k, d = 6, 3, 4, 5
    C = E * L
    lower = jnp.asarray(rng.uniform(-6, -4, d))
    upper = jnp.asarray(rng.uniform(4, 6, d))
    for t_dof in (0.0, 4.0):
        prop = _shared_layout_prop(rng, E, L, k, d, t_dof)
        x = jnp.asarray(rng.normal(size=(C, d)))
        xn = jnp.asarray(rng.normal(size=(C, d)))
        cur = jnp.asarray(rng.integers(0, k, C), dtype=jnp.int32)
        new = jnp.asarray(rng.integers(0, k, C), dtype=jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(13), C)

        nb_e, sel_e = pm.propose_clustered_ensemble(
            prop, x.reshape(E, L, d), cur.reshape(E, L), lower, upper,
            keys.reshape(E, L, -1),
        )
        flat = _tiled_per_chain(prop, E)
        nb_v, sel_v = jax.vmap(
            lambda p, xb, cl, kk: pm.propose_clustered(
                p, xb, cl, lower, upper, kk
            )
        )(flat, x, cur, keys)
        np.testing.assert_array_equal(
            np.asarray(sel_e).reshape(C), np.asarray(sel_v)
        )
        np.testing.assert_allclose(
            np.asarray(nb_e).reshape(C, d), np.asarray(nb_v), rtol=1e-12,
            atol=1e-12,
        )

        mh_e = pm.mh_log_ratio_clustered_ensemble(
            prop, x.reshape(E, L, d), xn.reshape(E, L, d),
            cur.reshape(E, L), new.reshape(E, L),
        )
        mh_v = jax.vmap(pm.mh_log_ratio_clustered)(flat, x, xn, cur, new)
        np.testing.assert_allclose(
            np.asarray(mh_e).reshape(C), np.asarray(mh_v), rtol=1e-11,
            atol=1e-11,
        )


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
