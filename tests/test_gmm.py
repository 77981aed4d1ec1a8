"""GMM fit tests (pattern follows the reference tests/stats/GMM.cpp, with
scipy/sklearn-free numpy oracles)."""

import numpy as np
import scipy.stats as st

from bcm3_tpu.stats.gmm import GMM, fit_gmm, fit_gmm_best_aic
from bcm3_tpu.stats.summary import acf, effective_sample_size


def test_from_params_logpdf():
    means = np.array([[0.0, 0.0], [4.0, 4.0]])
    covs = np.array([np.eye(2), [[2.0, 0.5], [0.5, 1.0]]])
    w = np.array([0.3, 0.7])
    gmm = GMM.from_params(means, covs, w)
    x = np.array([1.0, -0.5])
    expected = np.log(
        0.3 * st.multivariate_normal.pdf(x, means[0], covs[0])
        + 0.7 * st.multivariate_normal.pdf(x, means[1], covs[1])
    )
    np.testing.assert_allclose(gmm.log_pdf(x), expected, rtol=1e-10)


def test_responsibilities_sum_to_one():
    gmm = GMM.from_params(
        np.array([[0.0], [3.0]]),
        np.array([[[1.0]], [[1.0]]]),
        np.array([0.5, 0.5]),
    )
    r = gmm.responsibilities(np.array([[0.0], [1.5], [3.0]]))
    np.testing.assert_allclose(r.sum(axis=1), 1.0)
    assert r[0, 0] > 0.9 and r[2, 1] > 0.9


def test_fit_single_component():
    rng = np.random.default_rng(3)
    x = rng.multivariate_normal([1.0, -2.0], [[1.0, 0.4], [0.4, 2.0]], size=4000)
    gmm = fit_gmm(x, 1, rng)
    np.testing.assert_allclose(gmm.means[0], [1.0, -2.0], atol=0.1)
    np.testing.assert_allclose(gmm.covariances[0], [[1.0, 0.4], [0.4, 2.0]], atol=0.15)


def test_fit_two_components():
    rng = np.random.default_rng(4)
    x = np.concatenate(
        [rng.normal(0, 1, (1000, 2)), rng.normal(6, 1, (1000, 2))]
    )
    gmm = fit_gmm(x, 2, rng)
    assert gmm is not None
    centers = sorted(gmm.means[:, 0])
    np.testing.assert_allclose(centers, [0.0, 6.0], atol=0.3)
    np.testing.assert_allclose(gmm.weights.sum(), 1.0, rtol=1e-9)


def test_aic_selection_picks_two():
    rng = np.random.default_rng(5)
    x = np.concatenate(
        [rng.normal(0, 1, (800, 2)), rng.normal(7, 1, (800, 2))]
    )
    gmm = fit_gmm_best_aic(x, rng)
    assert gmm.num_components == 2


def test_insufficient_samples():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(10, 4))
    assert fit_gmm(x, 5, rng) is None


def test_acf_and_ess():
    rng = np.random.default_rng(7)
    # iid -> ESS close to N
    x = rng.normal(size=5000)
    ess = effective_sample_size(x)
    assert 3500 < ess < 6500
    # AR(1) with strong correlation -> much smaller ESS
    rho = 0.95
    y = np.empty(5000)
    y[0] = 0
    for i in range(1, 5000):
        y[i] = rho * y[i - 1] + rng.normal()
    assert effective_sample_size(y) < 1500
    np.testing.assert_allclose(acf(y, 0), 1.0)
    assert acf(y, 1) > 0.9


# ---------------------------------------------------------------------------
# batched device EM (stats/gmm_device.py)


def test_device_em_recovers_mixture():
    """Device EM recovers a well-separated 2-component mixture and the
    AIC selection picks k=2, matching the host path."""
    import numpy as np

    from bcm3_tpu.stats.gmm import fit_gmm_best_aic
    from bcm3_tpu.stats.gmm_device import fit_gmm_best_aic_device

    rng = np.random.default_rng(11)
    a = rng.multivariate_normal([-4, -4], [[1, 0.5], [0.5, 1]], size=900)
    b = rng.multivariate_normal([4, 4], [[1, -0.3], [-0.3, 0.8]], size=1100)
    h = np.concatenate([a, b])
    rng.shuffle(h)

    g_dev = fit_gmm_best_aic_device(h, np.random.default_rng(1))
    g_host = fit_gmm_best_aic(h, np.random.default_rng(1))
    assert g_dev is not None and g_host is not None
    assert g_dev.num_components == g_host.num_components == 2

    order_d = np.argsort(g_dev.means[:, 0])
    order_h = np.argsort(g_host.means[:, 0])
    np.testing.assert_allclose(
        g_dev.means[order_d], g_host.means[order_h], atol=0.15
    )
    np.testing.assert_allclose(
        np.sort(g_dev.weights), np.sort(g_host.weights), atol=0.03
    )
    np.testing.assert_allclose(
        g_dev.covariances[order_d], g_host.covariances[order_h], atol=0.3
    )
    # log-likelihoods of the two fits agree closely
    np.testing.assert_allclose(g_dev.logl, g_host.logl, rtol=5e-3)


def test_device_em_single_gaussian_matches_host():
    """For a unimodal target both paths should select k=1, whose fit is
    closed-form and therefore near-identical."""
    import numpy as np

    from bcm3_tpu.stats.gmm import fit_gmm_best_aic
    from bcm3_tpu.stats.gmm_device import fit_gmm_best_aic_device

    rng = np.random.default_rng(5)
    h = rng.multivariate_normal([1.0, -2.0, 0.5], np.diag([1.0, 2.0, 0.5]), size=800)
    g_dev = fit_gmm_best_aic_device(h, np.random.default_rng(2))
    g_host = fit_gmm_best_aic(h, np.random.default_rng(2))
    assert g_dev is not None and g_host is not None
    assert g_dev.num_components == g_host.num_components == 1
    np.testing.assert_allclose(g_dev.means, g_host.means, rtol=1e-10)
    np.testing.assert_allclose(g_dev.covariances, g_host.covariances, rtol=1e-10)
    np.testing.assert_allclose(g_dev.aic, g_host.aic, rtol=1e-10)


def test_device_em_too_few_samples():
    import numpy as np

    from bcm3_tpu.stats.gmm_device import fit_gmm_best_aic_device

    h = np.random.default_rng(0).normal(size=(1, 3))
    assert fit_gmm_best_aic_device(h, np.random.default_rng(0)) is None


def test_pt_sampling_with_device_gmm_backend():
    """Full PT adaptation cycle through the device EM backend."""
    import jax.numpy as jnp
    import numpy as np

    from bcm3_tpu.likelihoods import create_likelihood
    from bcm3_tpu.model.prior import Prior
    from bcm3_tpu.model.variables import VariableSet
    from bcm3_tpu.sampler import PTConfig, SamplerPT

    ref = "/root/reference/examples/banana"
    vs = VariableSet.from_xml(f"{ref}/prior.xml")
    prior = Prior.from_xml(f"{ref}/prior.xml", vs)
    lik = create_likelihood(f"{ref}/likelihood.xml", vs)
    cfg = PTConfig(
        num_samples=300,
        use_every_nth=2,
        num_chains=4,
        adapt_proposal_samples=150,
        adapt_proposal_times=1,
        gmm_fit_backend="device",
        seed=17,
    )
    res = SamplerPT(prior, lik, cfg).run()
    s = np.asarray(res["samples"])[150:, -1, :]
    assert np.isfinite(s).all()
    # posterior mass stays in a sane banana region
    assert abs(s[:, 0].mean()) < 2.5
