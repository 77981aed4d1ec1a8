"""End-to-end posterior-moment tests on the analytic examples.

Pattern: exact moments by quadrature; sampled moments must match within
a few Monte-Carlo standard errors (the reference validates the same
workloads by human inspection of R plots — examples/banana/plots.r).
"""

import os

import numpy as np
import pytest

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.model.prior import Prior
from bcm3_tpu.model.variables import VariableSet
from bcm3_tpu.sampler import PTConfig, SamplerPT

REF = "/root/reference/examples"


def _setup(example):
    varset = VariableSet.from_xml(os.path.join(REF, example, "prior.xml"))
    prior = Prior.from_xml(os.path.join(REF, example, "prior.xml"), varset)
    lik = create_likelihood(os.path.join(REF, example, "likelihood.xml"), varset)
    return prior, lik


def _banana_exact():
    x1 = np.linspace(-6, 4, 1500)
    x2 = np.linspace(-6, 20, 3000)
    X1, X2 = np.meshgrid(x1, x2, indexing="ij")
    mean2 = 4 * X1 + (1 - X1) ** 2
    logp = -0.5 * (X1 / 2.0) ** 2 - 0.5 * (X2 - mean2) ** 2
    p = np.exp(logp - logp.max())
    p /= p.sum()
    m = np.array([(p * X1).sum(), (p * X2).sum()])
    sd = np.array(
        [
            np.sqrt((p * (X1 - m[0]) ** 2).sum()),
            np.sqrt((p * (X2 - m[1]) ** 2).sum()),
        ]
    )
    return m, sd


@pytest.mark.slow
def test_banana_posterior_moments():
    prior, lik = _setup("banana")
    cfg = PTConfig(
        num_samples=3000,
        use_every_nth=5,
        num_chains=6,
        adapt_proposal_samples=750,
        adapt_proposal_times=1,
        max_history_size=5000,
        adapt_proposal_max_history_samples=5000,
        swapping_scheme="deterministic_even_odd",
        seed=1234,
    )
    s = SamplerPT(prior, lik, cfg)
    res = s.run()
    x = res["samples"][1500:, -1, :]  # T=1 chain, second half
    m_exact, sd_exact = _banana_exact()
    m, sd = x.mean(axis=0), x.std(axis=0)
    # generous MC-error bounds for ~1500 correlated draws
    assert abs(m[0] - m_exact[0]) < 0.35, (m, m_exact)
    assert abs(m[1] - m_exact[1]) < 0.9, (m, m_exact)
    assert abs(sd[0] - sd_exact[0]) / sd_exact[0] < 0.20
    assert abs(sd[1] - sd_exact[1]) / sd_exact[1] < 0.20


@pytest.mark.slow
def test_multimodal_gaussians_globalcov():
    prior, lik = _setup("multimodal_gaussians")
    cfg = PTConfig(
        num_samples=4000,
        use_every_nth=3,
        num_chains=4,
        proposal_type="global_covariance",
        adapt_proposal_samples=1000,
        adapt_proposal_times=1,
        max_history_size=4000,
        adapt_proposal_max_history_samples=2000,
        swapping_scheme="deterministic_even_odd",
        seed=99,
    )
    s = SamplerPT(prior, lik, cfg)
    res = s.run()
    x = res["samples"][2000:, -1, :]
    # both modes visited: means at (-5,-5) and (5,5), equal weights;
    # overall mean near 0 and both signs present
    frac_pos = (x[:, 0] > 0).mean()
    assert 0.2 < frac_pos < 0.8, frac_pos
    assert abs(x.mean()) < 2.0


@pytest.mark.slow
def test_truncated_t_single_chain_gmm():
    prior, lik = _setup("truncated_t")
    cfg = PTConfig(
        num_samples=4000,
        use_every_nth=5,
        num_chains=1,
        adapt_proposal_samples=1000,
        adapt_proposal_times=2,
        max_history_size=2000,
        adapt_proposal_max_history_samples=2000,
        num_exploration_steps=2,
        seed=7,
    )
    s = SamplerPT(prior, lik, cfg)
    res = s.run()
    x = res["samples"][2000:, 0, :]
    # exact moments by quadrature over the truncation box
    import scipy.stats as st
    from bcm3_tpu.likelihoods import parse_matrix, parse_vector

    g = np.linspace(-2, 5, 120)
    G = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    mus = [parse_vector("0.5;2.0;0.0"), parse_vector("4.0;1.0;2.0")]
    sigmas = [
        parse_matrix("0.4,-0.3,0.0;-0.3,0.4,0.0;0.0,0.0,0.2"),
        parse_matrix("0.5,0.2,0.3;0.2,0.3,0.4;0.3,0.4,0.8"),
    ]
    dens = 0.3 * st.multivariate_t.pdf(G, mus[0], sigmas[0], 3.0) + 0.7 * (
        st.multivariate_t.pdf(G, mus[1], sigmas[1], 4.0)
    )
    dens /= dens.sum()
    m_exact = (dens[:, None] * G).sum(axis=0)
    m = x.mean(axis=0)
    assert np.all(np.abs(m - m_exact) < 0.3), (m, m_exact)


def test_temperature_ladder():
    from bcm3_tpu.sampler import temperature_ladder

    t = temperature_ladder(6, 3.0, 1.0)
    assert t[0] == 0.0 and t[-1] == 1.0
    np.testing.assert_allclose(t[1], (1 / 5) ** 3)
    t1 = temperature_ladder(1)
    assert t1[0] == 1.0


def test_short_run_shapes():
    prior, lik = _setup("banana")
    cfg = PTConfig(
        num_samples=50,
        use_every_nth=2,
        num_chains=4,
        adapt_proposal_samples=25,
        adapt_proposal_times=1,
        seed=5,
    )
    s = SamplerPT(prior, lik, cfg)
    res = s.run()
    assert res["samples"].shape == (50, 4, 2)
    assert res["log_prior"].shape == (50, 4)
    assert res["log_likelihood"].shape == (50, 4)
    acc = res["acceptance"]
    # T=0 chain accepts everything (prior sampling)
    assert acc["accepted_mutate"][0] == acc["attempted_mutate"][0]
    assert np.all(np.isfinite(res["log_likelihood"][:, -1]))
