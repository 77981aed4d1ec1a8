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
