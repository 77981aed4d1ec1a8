"""HMC / SMC / VI backend tests — posterior correctness on analytic
targets (backends beyond the reference; BASELINE north star)."""

import numpy as np
import pytest

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.model.prior import Prior
from bcm3_tpu.model.variables import VariableSet
from bcm3_tpu.sampler import (
    HMCConfig,
    SamplerHMC,
    SamplerSMC,
    SamplerVI,
    SMCConfig,
    VIConfig,
    create_sampler,
)

REF = "/root/reference/examples"


def _banana():
    varset = VariableSet.from_xml(f"{REF}/banana/prior.xml")
    prior = Prior.from_xml(f"{REF}/banana/prior.xml", varset)
    lik = create_likelihood(f"{REF}/banana/likelihood.xml", varset)
    return prior, lik


def _banana_exact(prior):
    g1 = np.linspace(-6, 4, 1200)
    g2 = np.linspace(-6, 20, 2400)
    X1, X2 = np.meshgrid(g1, g2, indexing="ij")
    logp = -0.5 * (X1 / 2.0) ** 2 - 0.5 * (X2 - (4 * X1 + (1 - X1) ** 2)) ** 2
    lo, hi = prior.lower, prior.upper
    mask = (X1 >= lo[0]) & (X1 <= hi[0]) & (X2 >= lo[1]) & (X2 <= hi[1])
    p = np.where(mask, np.exp(logp - logp.max()), 0.0)
    p /= p.sum()
    m = np.array([(p * X1).sum(), (p * X2).sum()])
    sd = np.array(
        [
            np.sqrt((p * (X1 - m[0]) ** 2).sum()),
            np.sqrt((p * (X2 - m[1]) ** 2).sum()),
        ]
    )
    return m, sd


def test_hmc_banana_moments():
    prior, lik = _banana()
    s = SamplerHMC(
        prior,
        lik,
        HMCConfig(
            num_samples=400,
            num_warmup=400,
            num_chains=8,
            num_leapfrog_steps=16,
            seed=1,
        ),
    )
    res = s.run()
    assert 0.4 < res["accept_rate"] <= 1.0
    x = res["samples"][:, 0, :]
    m, sd = _banana_exact(prior)
    got_m = x.mean(axis=0)
    got_sd = x.std(axis=0)
    assert np.all(np.abs(got_m - m) < 0.3), (got_m, m)
    assert np.all(np.abs(got_sd - sd) / sd < 0.2), (got_sd, sd)


def test_smc_banana_moments_and_evidence():
    prior, lik = _banana()
    s = SamplerSMC(
        prior, lik, SMCConfig(num_particles=4096, mutation_steps=5, seed=2)
    )
    res = s.run()
    x = res["samples"][:, 0, :]
    m, sd = _banana_exact(prior)
    got_m = x.mean(axis=0)
    assert np.all(np.abs(got_m - m) < 0.3), (got_m, m)
    # SMC log-evidence vs quadrature: Z = mean over prior of exp(llh)
    g1 = np.linspace(prior.lower[0], prior.upper[0], 1200)
    g2 = np.linspace(prior.lower[1], prior.upper[1], 2400)
    X1, X2 = np.meshgrid(g1, g2, indexing="ij")
    # full normalized banana log-likelihood (sd1=2, sd2=1)
    logp = (
        -0.5 * (X1 / 2.0) ** 2
        - np.log(2.0 * np.sqrt(2 * np.pi))
        - 0.5 * (X2 - (4 * X1 + (1 - X1) ** 2)) ** 2
        - np.log(np.sqrt(2 * np.pi))
    )
    dx = (g1[1] - g1[0]) * (g2[1] - g2[0])
    vol = (prior.upper[0] - prior.lower[0]) * (prior.upper[1] - prior.lower[1])
    log_z = np.log(np.exp(logp).sum() * dx / vol)
    assert abs(res["log_marginal_likelihood"] - log_z) < 0.15, (
        res["log_marginal_likelihood"],
        log_z,
    )


def test_vi_gaussian_target(tmp_path):
    """VI on a Gaussian target must recover mean and sd accurately
    (mean-field is exact for an axis-aligned Gaussian)."""
    plugin = tmp_path / "gauss.py"
    plugin.write_text(
        "import jax.numpy as jnp\n"
        "def make_log_prob(names):\n"
        "    def log_prob(v):\n"
        "        return (-0.5*((v[0]-1.0)/0.3)**2\n"
        "                -0.5*((v[1]+2.0)/0.7)**2)\n"
        "    return log_prob\n"
    )
    import textwrap

    prior_xml = tmp_path / "prior.xml"
    prior_xml.write_text(
        "<prior>\n"
        '<variable name="a" distribution="uniform" lower="-10" upper="10"/>\n'
        '<variable name="b" distribution="uniform" lower="-10" upper="10"/>\n'
        "</prior>\n"
    )
    varset = VariableSet.from_xml(str(prior_xml))
    prior = Prior.from_xml(str(prior_xml), varset)
    lik = create_likelihood("dll", varset, dll_filename_base=str(plugin)[:-3])
    s = SamplerVI(
        prior,
        lik,
        VIConfig(
            num_iterations=3000,
            num_mc_samples=64,
            learning_rate=0.02,
            num_samples=4000,
            seed=3,
        ),
    )
    res = s.run()
    x = res["samples"][:, 0, :]
    np.testing.assert_allclose(x.mean(axis=0), [1.0, -2.0], atol=0.15)
    np.testing.assert_allclose(x.std(axis=0), [0.3, 0.7], rtol=0.25)


def test_factory_new_backends():
    prior, lik = _banana()
    from bcm3_tpu.sampler.hmc import SamplerHMC as H
    from bcm3_tpu.sampler.smc import SamplerSMC as S
    from bcm3_tpu.sampler.vi import SamplerVI as V

    assert isinstance(
        create_sampler(prior, lik, {"sampler.type": "hmc"}), H
    )
    assert isinstance(
        create_sampler(prior, lik, {"sampler.type": "smc"}), S
    )
    assert isinstance(
        create_sampler(prior, lik, {"sampler.type": "vi"}), V
    )
