"""Importance sampler tests (reference: src/sampler/SamplerIS.cpp)."""

import numpy as np

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.model.prior import Prior
from bcm3_tpu.model.variables import VariableSet
from bcm3_tpu.sampler import ISConfig, SamplerIS, create_sampler

REF = "/root/reference/examples"


def _setup(example):
    varset = VariableSet.from_xml(f"{REF}/{example}/prior.xml")
    prior = Prior.from_xml(f"{REF}/{example}/prior.xml", varset)
    lik = create_likelihood(f"{REF}/{example}/likelihood.xml", varset)
    return prior, lik


def test_is_shapes_and_weights():
    prior, lik = _setup("banana")
    s = SamplerIS(prior, lik, ISConfig(num_samples=500, seed=3, batch_size=256))
    res = s.run()
    assert res["samples"].shape == (500, 1, 2)
    assert res["weights"].shape == (500, 1)
    assert np.all(res["weights"] >= 0)
    # kept weights respect the running-max cutoff within each prefix
    lw = res["log_likelihood"][:, 0]
    run_max = np.maximum.accumulate(lw)
    assert np.all(lw >= run_max - 23.02585 - 1e-12)


def test_is_posterior_moments():
    """Self-normalized IS estimate of the banana posterior mean matches
    quadrature within MC error."""
    prior, lik = _setup("banana")
    s = SamplerIS(prior, lik, ISConfig(num_samples=20000, seed=11, batch_size=4096))
    res = s.run()
    x = res["samples"][:, 0, :]
    lw = res["log_likelihood"][:, 0] - res["log_likelihood"][:, 0].max()
    w = np.exp(lw)
    w /= w.sum()
    m = (w[:, None] * x).sum(axis=0)

    g1 = np.linspace(-6, 4, 1200)
    g2 = np.linspace(-6, 20, 2400)
    X1, X2 = np.meshgrid(g1, g2, indexing="ij")
    logp = -0.5 * (X1 / 2.0) ** 2 - 0.5 * (X2 - (4 * X1 + (1 - X1) ** 2)) ** 2
    # restrict to the banana prior's support (uniform box)
    lo = prior.lower
    hi = prior.upper
    mask = (X1 >= lo[0]) & (X1 <= hi[0]) & (X2 >= lo[1]) & (X2 <= hi[1])
    p = np.where(mask, np.exp(logp - logp.max()), 0.0)
    p /= p.sum()
    m_exact = np.array([(p * X1).sum(), (p * X2).sum()])
    assert np.all(np.abs(m - m_exact) < 0.3), (m, m_exact)


def test_factory_dispatch():
    prior, lik = _setup("banana")
    s = create_sampler(prior, lik, {"sampler.type": "is", "sampler.num_samples": "10"})
    assert isinstance(s, SamplerIS)
    from bcm3_tpu.sampler import SamplerPT

    s2 = create_sampler(
        prior,
        lik,
        {
            "sampler.type": "ptmh",
            "sampler.num_samples": "10",
        },
    )
    assert isinstance(s2, SamplerPT)
