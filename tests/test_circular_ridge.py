"""Circular-ridge posterior test: the reference's 16-chain example
(reference: examples/multimodal_circular_ridge/config.txt)."""

import numpy as np
import pytest

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.model.prior import Prior
from bcm3_tpu.model.variables import VariableSet
from bcm3_tpu.sampler import PTConfig, SamplerPT

REF = "/root/reference/examples/multimodal_circular_ridge"


def _exact_moments(prior):
    g = np.linspace(-6, 6, 1200)
    X1, X2 = np.meshgrid(g, g, indexing="ij")
    d1 = np.sqrt((X1 + 3.5) ** 2 + X2**2)
    d2 = np.sqrt((X1 - 3.5) ** 2 + X2**2)
    l1 = -0.5 * ((d1 - 2.0) / 0.1) ** 2
    l2 = -0.5 * ((d2 - 2.0) / 0.1) ** 2
    logp = np.logaddexp(l1, l2)
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
def test_circular_ridge_posterior():
    varset = VariableSet.from_xml(f"{REF}/prior.xml")
    prior = Prior.from_xml(f"{REF}/prior.xml", varset)
    lik = create_likelihood(f"{REF}/likelihood.xml", varset)
    cfg = PTConfig(
        num_samples=3000,
        use_every_nth=2,
        num_chains=16,  # the reference example's ladder
        adapt_proposal_samples=1000,
        adapt_proposal_times=2,
        swapping_scheme="deterministic_even_odd",
        seed=23,
    )
    res = SamplerPT(prior, lik, cfg).run()
    x = res["samples"][1500:, -1, :]
    m_exact, sd_exact = _exact_moments(prior)
    m = x.mean(axis=0)
    sd = x.std(axis=0)
    # symmetric bimodal target: mean ~0, both ridges must be visited
    assert np.all(np.abs(m - m_exact) < 0.6), (m, m_exact)
    assert np.all(np.abs(sd - sd_exact) / sd_exact < 0.15), (sd, sd_exact)
    left = (x[:, 0] < 0).mean()
    assert 0.2 < left < 0.8, left


def test_circular_ridge_short():
    varset = VariableSet.from_xml(f"{REF}/prior.xml")
    prior = Prior.from_xml(f"{REF}/prior.xml", varset)
    lik = create_likelihood(f"{REF}/likelihood.xml", varset)
    cfg = PTConfig(
        num_samples=40,
        num_chains=16,
        adapt_proposal_samples=0,
        adapt_proposal_times=0,
        seed=2,
    )
    res = SamplerPT(prior, lik, cfg).run()
    assert res["samples"].shape == (40, 16, 2)
    assert np.isfinite(res["log_likelihood"][:, -1]).all()
