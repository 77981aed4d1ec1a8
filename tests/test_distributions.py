"""Distribution oracle tests against scipy (the reference validates its
stats layer the same way against R's mvtnorm — tests/stats/mvn.cpp)."""

import numpy as np
import pytest
import scipy.stats as st

from bcm3_tpu.distributions import univariate as uv
from bcm3_tpu.distributions.mvn import logpdf_mvn, logpdf_mvt

RTOL = 1e-10

xs = np.array([-2.5, -0.3, 0.2, 1.7, 4.2])
pos = np.array([0.01, 0.5, 1.3, 2.9, 10.0])
unit = np.array([0.01, 0.2, 0.5, 0.77, 0.99])


def test_normal():
    np.testing.assert_allclose(
        uv.logpdf_normal(xs, 0.7, 1.3), st.norm.logpdf(xs, 0.7, 1.3), rtol=RTOL
    )
    np.testing.assert_allclose(
        uv.cdf_normal(xs, 0.7, 1.3), st.norm.cdf(xs, 0.7, 1.3), rtol=1e-8
    )
    np.testing.assert_allclose(
        uv.quantile_normal(unit, 0.7, 1.3), st.norm.ppf(unit, 0.7, 1.3), rtol=1e-8
    )


def test_uniform():
    np.testing.assert_allclose(
        uv.logpdf_uniform(unit, 0.0, 2.0), st.uniform.logpdf(unit, 0, 2), rtol=RTOL
    )
    assert uv.logpdf_uniform(3.0, 0.0, 2.0) == -np.inf
    # bounds are inclusive (reference: UnivariateMarginal.cpp:330-338)
    assert np.isfinite(uv.logpdf_uniform(2.0, 0.0, 2.0))


def test_exponential():
    lam = 1.7
    np.testing.assert_allclose(
        uv.logpdf_exponential(pos, lam),
        st.expon.logpdf(pos, scale=1 / lam),
        rtol=RTOL,
    )
    np.testing.assert_allclose(
        uv.cdf_exponential(pos, lam), st.expon.cdf(pos, scale=1 / lam), rtol=1e-9
    )
    assert uv.logpdf_exponential(-1.0, lam) == -np.inf


def test_gamma():
    k, theta = 2.3, 1.4
    np.testing.assert_allclose(
        uv.logpdf_gamma(pos, k, theta),
        st.gamma.logpdf(pos, k, scale=theta),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        uv.cdf_gamma(pos, k, theta), st.gamma.cdf(pos, k, scale=theta), rtol=1e-7
    )


def test_beta():
    a, b = 2.0, 3.5
    np.testing.assert_allclose(
        uv.logpdf_beta(unit, a, b), st.beta.logpdf(unit, a, b), rtol=1e-9
    )
    np.testing.assert_allclose(
        uv.cdf_beta(unit, a, b), st.beta.cdf(unit, a, b), rtol=1e-7
    )


def test_half_cauchy():
    scale = 2.0
    np.testing.assert_allclose(
        uv.logpdf_half_cauchy(pos, scale),
        st.halfcauchy.logpdf(pos, scale=scale),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        uv.cdf_half_cauchy(pos, scale), st.halfcauchy.cdf(pos, scale=scale), rtol=1e-9
    )
    assert uv.logpdf_half_cauchy(-0.1, scale) == -np.inf


def test_beta_prime():
    a, b, scale = 2.0, 3.0, 1.5
    # scaled betaprime: scipy betaprime with scale parameter
    np.testing.assert_allclose(
        uv.logpdf_beta_prime(pos, a, b, scale),
        st.betaprime.logpdf(pos, a, b, scale=scale),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        uv.cdf_beta_prime(pos, a, b, scale),
        st.betaprime.cdf(pos, a, b, scale=scale),
        rtol=1e-7,
    )


def test_exponential_mix():
    lam, lam2, mix = 1.0, 0.2, 0.3
    expected = np.log(
        mix * st.expon.pdf(pos, scale=1 / lam)
        + (1 - mix) * st.expon.pdf(pos, scale=1 / lam2)
    )
    np.testing.assert_allclose(
        uv.logpdf_exponential_mix(pos, lam, lam2, mix), expected, rtol=1e-9
    )


def test_student_t():
    mu, sigma, nu = 0.3, 1.2, 4.0
    np.testing.assert_allclose(
        uv.logpdf_t(xs, mu, sigma, nu),
        st.t.logpdf(xs, nu, loc=mu, scale=sigma),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        uv.cdf_t(xs, mu, sigma, nu), st.t.cdf(xs, nu, loc=mu, scale=sigma), rtol=1e-7
    )


def test_truncated_normal():
    mu, sigma, lo, hi = 0.5, 1.0, -1.0, 2.0
    a, b = (lo - mu) / sigma, (hi - mu) / sigma
    inside = np.array([-0.5, 0.0, 1.5])
    np.testing.assert_allclose(
        uv.logpdf_truncated_normal(inside, mu, sigma, lo, hi),
        st.truncnorm.logpdf(inside, a, b, loc=mu, scale=sigma),
        rtol=1e-7,
    )
    assert uv.logpdf_truncated_normal(3.0, mu, sigma, lo, hi) == -np.inf


def test_mvn():
    # oracle values in the style of tests/stats/mvn.cpp (vs scipy instead of R)
    mean = np.array([0.3, -0.2, 1.0])
    cov = np.array([[1.0, 0.3, 0.1], [0.3, 2.0, -0.4], [0.1, -0.4, 1.5]])
    x = np.array([[0.0, 0.0, 0.0], [1.0, -1.0, 2.0]])
    np.testing.assert_allclose(
        logpdf_mvn(x, mean, cov),
        st.multivariate_normal.logpdf(x, mean, cov),
        rtol=1e-10,
    )


def test_mvt():
    mean = np.array([0.5, 2.0, 0.0])
    scale = np.array([[0.4, -0.3, 0.0], [-0.3, 0.4, 0.0], [0.0, 0.0, 0.2]])
    nu = 3.0
    x = np.array([[0.0, 0.0, 0.0], [0.5, 1.9, 0.1]])
    np.testing.assert_allclose(
        logpdf_mvt(x, mean, scale, nu),
        st.multivariate_t.logpdf(x, mean, scale, nu),
        rtol=1e-10,
    )


def test_gpd():
    mu, sigma, xi = 0.0, 1.5, 0.3
    np.testing.assert_allclose(
        uv.logpdf_gpd(pos, mu, sigma, xi),
        st.genpareto.logpdf(pos, xi, loc=mu, scale=sigma),
        rtol=1e-9,
    )
