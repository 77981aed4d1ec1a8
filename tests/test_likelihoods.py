"""Analytic likelihood oracle tests (formulas recomputed in numpy/scipy)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from bcm3_tpu.likelihoods import create_likelihood, parse_matrix, parse_vector
from bcm3_tpu.model.variables import VariableSet

REF = "/root/reference/examples"


def _varset(n):
    vs = VariableSet()
    for i in range(n):
        vs.add_variable(f"x{i+1}")
    return vs


def test_banana():
    lik = create_likelihood(os.path.join(REF, "banana", "likelihood.xml"), _varset(2))
    x = np.array([0.7, -1.2])
    y = x[0]
    expected = st.norm.logpdf(x[0], 0, 2.0) + st.norm.logpdf(
        x[1], 4 * y + (1 - y) ** 2, 1.0
    )
    np.testing.assert_allclose(float(lik.log_prob(jnp.asarray(x))), expected, rtol=1e-9)


def test_banana_higher_dim():
    from bcm3_tpu.likelihoods.analytic import make_banana

    lp = make_banana(4, 2.0, 1.0)
    x = np.array([0.3, -0.5, 1.1, 2.0])
    y = x[:3].sum()
    expected = st.norm.logpdf(x[:3], 0, 2.0).sum() + st.norm.logpdf(
        x[3], 4 * y + (1 - y) ** 2, 1.0
    )
    np.testing.assert_allclose(float(lp(jnp.asarray(x))), expected, rtol=1e-9)


def test_circular():
    lik = create_likelihood(
        os.path.join(REF, "multimodal_circular_ridge", "likelihood.xml"), _varset(2)
    )
    x = np.array([1.0, 1.5])
    d1 = np.linalg.norm(x - np.array([-3.5, 0.0]))
    d2 = np.linalg.norm(x - np.array([3.5, 0.0]))
    expected = np.logaddexp(
        st.norm.logpdf(d1, 2.0, 0.1), st.norm.logpdf(d2, 2.0, 0.1)
    )
    np.testing.assert_allclose(float(lik.log_prob(jnp.asarray(x))), expected, rtol=1e-9)


def test_multimodal_gaussians():
    lik = create_likelihood(
        os.path.join(REF, "multimodal_gaussians", "likelihood.xml"), _varset(2)
    )
    x = np.array([-4.0, -5.5])
    lp1 = np.log(0.5) + st.multivariate_normal.logpdf(
        x, [-5, -5], [[1, -0.9], [-0.9, 1]]
    )
    lp2 = np.log(0.5) + st.multivariate_normal.logpdf(
        x, [5, 5], [[2, -0.5], [-0.5, 1]]
    )
    expected = np.logaddexp(lp1, lp2)
    np.testing.assert_allclose(float(lik.log_prob(jnp.asarray(x))), expected, rtol=1e-9)


def test_truncated_t():
    lik = create_likelihood(
        os.path.join(REF, "truncated_t", "likelihood.xml"), _varset(3)
    )
    x = np.array([0.6, 1.8, 0.2])
    mus = [parse_vector("0.5;2.0;0.0"), parse_vector("4.0;1.0;2.0")]
    sigmas = [
        parse_matrix("0.4,-0.3,0.0;-0.3,0.4,0.0;0.0,0.0,0.2"),
        parse_matrix("0.5,0.2,0.3;0.2,0.3,0.4;0.3,0.4,0.8"),
    ]
    nus = [3.0, 4.0]
    w = np.array([0.3, 0.7])
    expected = np.logaddexp(
        np.log(w[0]) + st.multivariate_t.logpdf(x, mus[0], sigmas[0], nus[0]),
        np.log(w[1]) + st.multivariate_t.logpdf(x, mus[1], sigmas[1], nus[1]),
    )
    np.testing.assert_allclose(float(lik.log_prob(jnp.asarray(x))), expected, rtol=1e-9)


def test_vmap_and_jit():
    lik = create_likelihood(os.path.join(REF, "banana", "likelihood.xml"), _varset(2))
    xs = jnp.asarray(np.random.default_rng(0).normal(size=(64, 2)))
    batched = jax.jit(jax.vmap(lik.log_prob))(xs)
    singles = np.array([float(lik.log_prob(x)) for x in xs])
    np.testing.assert_allclose(np.asarray(batched), singles, rtol=1e-9)


def test_parse_helpers():
    np.testing.assert_allclose(parse_vector("1.0;2.5;3"), [1.0, 2.5, 3.0])
    np.testing.assert_allclose(
        parse_matrix("1,2;3,4"), np.array([[1.0, 2.0], [3.0, 4.0]])
    )


def test_dummy():
    lik = create_likelihood("dummy", _varset(2))
    assert float(lik.log_prob(jnp.zeros(2))) == 0.0
