"""End-to-end PT sampling on the synthetic PopPK workload."""

import jax.numpy as jnp
import numpy as np
import pytest

from bcm3_tpu.likelihoods import create_likelihood
from bcm3_tpu.likelihoods.poppk_synth import (
    make_poppk_varset,
    synthesize_trial,
    truth_to_values,
    write_poppk_likelihood_xml,
    write_poppk_prior_xml,
)
from bcm3_tpu.model.prior import Prior
from bcm3_tpu.sampler import PTConfig, SamplerPT


@pytest.mark.slow
def test_poppk_pt_sampling(tmp_path):
    P = 6
    trial, truth = synthesize_trial(num_patients=P, num_timepoints=14, seed=11)
    pkdata = str(tmp_path / "pkdata.nc")
    trial.save(pkdata, "TRIAL1", "lapatinib")

    prior_xml = str(tmp_path / "prior.xml")
    lik_xml = str(tmp_path / "likelihood.xml")
    write_poppk_prior_xml(prior_xml, P, "one")
    write_poppk_likelihood_xml(lik_xml, pkdata, "TRIAL1", "lapatinib", "one")

    from bcm3_tpu.model.variables import VariableSet

    varset = VariableSet.from_xml(prior_xml)
    prior = Prior.from_xml(prior_xml, varset)
    lik = create_likelihood(lik_xml, varset)
    assert varset.num_variables == 4 + 2 * (P + 1) + 2

    cfg = PTConfig(
        num_samples=400,
        use_every_nth=2,
        num_chains=4,
        adapt_proposal_samples=100,
        adapt_proposal_times=2,
        max_history_size=2000,
        swapping_scheme="deterministic_even_odd",
        seed=321,
    )
    s = SamplerPT(prior, lik, cfg)
    res = s.run()

    # likelihood at sampled points should approach the truth's likelihood
    values = truth_to_values(truth, varset, "one")
    lp_truth = float(lik.log_prob(jnp.asarray(values)))
    best = res["log_likelihood"][:, -1].max()
    assert np.isfinite(best)
    # within a plausible band (the sampler can even beat the truth by fitting noise)
    assert best > lp_truth - 50.0, (best, lp_truth)

    acc = res["acceptance"]
    rate = acc["accepted_mutate"][-1] / acc["attempted_mutate"][-1]
    assert 0.05 < rate < 0.9


@pytest.mark.slow
def test_poppk_transit_pt_sampling(tmp_path):
    """End-to-end PT on the transit-compartment model: exercises the
    batched budgeted DP5 integrator (ode/dp5.py solve_at_times_budget)
    under the sampler — the reference's adaptive-integrator hot loop
    (ODESolverCVODE.cpp:322-445) driven by MCMC proposals, not just
    likelihood-level oracle checks."""
    P = 4
    trial, truth = synthesize_trial(num_patients=P, num_timepoints=12, seed=5)
    pkdata = str(tmp_path / "pkdata.nc")
    trial.save(pkdata, "TRIAL1", "lapatinib")

    prior_xml = str(tmp_path / "prior.xml")
    lik_xml = str(tmp_path / "likelihood.xml")
    write_poppk_prior_xml(prior_xml, P, "one_transit")
    write_poppk_likelihood_xml(
        lik_xml, pkdata, "TRIAL1", "lapatinib", "one_transit"
    )

    from bcm3_tpu.model.variables import VariableSet

    varset = VariableSet.from_xml(prior_xml)
    prior = Prior.from_xml(prior_xml, varset)
    lik = create_likelihood(lik_xml, varset)

    cfg = PTConfig(
        num_samples=200,
        use_every_nth=2,
        num_chains=4,
        adapt_proposal_samples=100,
        adapt_proposal_times=1,
        max_history_size=1000,
        swapping_scheme="deterministic_even_odd",
        seed=13,
    )
    s = SamplerPT(prior, lik, cfg)
    res = s.run()

    # the T=1 chain must reach and stay in a finite, data-fitting region
    llh = res["log_likelihood"][:, -1]
    assert np.isfinite(llh[-50:]).all()
    # the synthetic data was generated from the one/two-compartment model,
    # so the transit model fits it with some structural slack; require the
    # sampler to land within a broad but non-trivial band of the best fit
    n_obs = np.isfinite(np.asarray(trial.observed)).sum()
    assert llh.max() > -8.0 * n_obs, (llh.max(), n_obs)

    acc = res["acceptance"]
    rate = acc["accepted_mutate"][-1] / acc["attempted_mutate"][-1]
    assert 0.02 < rate < 0.95
